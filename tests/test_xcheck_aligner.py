"""Aligner cross-check: our GroupAligner vs the GENUINE reference optimizer.

Second half of the round-4 proof (VERDICT.md next-round item 1): the
reference's `LightPointCloudGroupOptimizer` + `compute_global_alignment
(init='group')` (/root/reference/dust3r/cloud_opt/optimizer_group.py:31,
base_opt_group.py:496, init_im_poses.py:61-405) runs unmodified on CPU torch
(roma provided by the self-tested functional stub in tests/_refstubs.py),
and our `GroupAligner` + `init_from_group` runs on the SAME synthetic
windowed geometry. Both must recover the ground-truth trajectory and focal.

Why synthetic inputs: at tiny diffusion width the decoded maps are not a
consistent 3D scene, so optimizer outputs would be RANSAC noise. Here the
inputs are self-consistent by construction — GT camera trajectory + smooth
per-frame depth, each window expressed in its own sim3 frame (per-window
rotation/translation/scale), with pixel noise — so both optimizers face the
exact inverse problem the diffusion stage produces, with a known answer.

Scope: init chain (MoGe focal recovery, per-frame PnP, sim3 window
registration, depth init) + the conf-weighted point-map loss + temporal
smoothness, 200 iters (the 150-iter disparity/traj calibration stays
inactive — no invdepth/traj inputs — its
semantics are pinned separately by closed-form fixtures in tests/test_evals
and tests/test_alignment).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _refstubs  # noqa: E402

_refstubs.install()

pytestmark = pytest.mark.slow

H, W = 32, 48
F_GT = 45.0
N = 10          # frames
S = 6           # window size
STRIDE = 2      # -> windows [0:6], [2:8], [4:10]
NITER = 200


def _rot_xyz(rx, ry, rz):
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler("xyz", [rx, ry, rz]).as_matrix()


def _make_scene(seed=5):
    """GT trajectory + per-frame depth -> per-window sim3-framed pointmaps."""
    rng = np.random.default_rng(seed)
    groups = np.stack([np.arange(s, s + S) for s in range(0, N - S + 1, STRIDE)])
    G = groups.shape[0]

    # GT c2w poses: smooth rotation + translation
    poses = np.zeros((N, 4, 4), np.float32)
    for i in range(N):
        poses[i, :3, :3] = _rot_xyz(0.015 * i, 0.03 * i, -0.01 * i)
        poses[i, :3, 3] = [0.08 * i, 0.015 * i, 0.04 * i]
        poses[i, 3, 3] = 1.0

    # per-frame smooth positive depth
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    depths = np.stack([
        3.0 + 0.8 * np.sin(2 * np.pi * u / W + 0.25 * i)
        * np.cos(2 * np.pi * v / H) + 0.05 * i
        for i in range(N)
    ])                                                    # (N, H, W) in ~[2.1, 4.3]

    # camera-frame points (pp at image center, base_opt_group convention)
    x = (u[None] - W / 2) / F_GT * depths
    y = (v[None] - H / 2) / F_GT * depths
    cam_pts = np.stack([x, y, depths], axis=-1)           # (N, H, W, 3)
    world_pts = (
        np.einsum("nij,nhwj->nhwi", poses[:, :3, :3], cam_pts)
        + poses[:, None, None, :3, 3]
    )

    # each window lives in its own sim3 frame: X_world = s_w R_w Y + t_w
    win_scales = np.array([1.0, 1.35, 0.75], np.float32)[:G]
    pred_pts = np.zeros((G, S, H, W, 3), np.float32)
    for g in range(G):
        Tw = poses[groups[g, 0]]
        Rw, tw = Tw[:3, :3], Tw[:3, 3]
        for k, i in enumerate(groups[g]):
            Y = (world_pts[i] - tw) @ Rw / win_scales[g]  # R^T x == x @ R
            pred_pts[g, k] = Y
    pred_pts += rng.normal(0, 0.003, pred_pts.shape).astype(np.float32)

    conf = rng.uniform(0.9, 1.1, (G, S, H, W)).astype(np.float32)
    return groups, pred_pts, conf, poses, depths


@pytest.fixture(scope="module")
def scene():
    return _make_scene()


@pytest.fixture(scope="module")
def ref_result(scene):
    """Run the genuine reference optimizer end to end on CPU."""
    groups, pred_pts, conf, _, _ = scene
    torch.manual_seed(0)
    from dust3r.cloud_opt.optimizer_group import LightPointCloudGroupOptimizer

    G = groups.shape[0]
    view_list = [
        [{"img": torch.zeros(3, H, W), "idx": (int(i),)} for i in groups[g]]
        for g in range(G)
    ]
    pred_list = [
        {
            "pts3d": torch.from_numpy(pred_pts[g]),
            "conf": torch.from_numpy(conf[g][..., None]),
        }
        for g in range(G)
    ]
    scene_opt = LightPointCloudGroupOptimizer(
        view_list, pred_list, conf="id", conf_optimize=True, verbose=False,
        shared_focal=True, flow_loss_weight=0.0,
        num_total_iter=NITER, temporal_smoothing_weight=0.015,
        translation_weight=1.0,
    )
    scene_opt.compute_global_alignment(
        init="group", niter_PnP=10, niter=NITER, schedule="linear", lr=0.03
    )
    with torch.no_grad():
        return {
            "poses": scene_opt.get_im_poses().numpy(),
            "focal": float(scene_opt.get_focals()[0]),
            "depths": torch.stack(scene_opt.get_depthmaps(), 0).numpy(),
        }


@pytest.fixture(scope="module")
def our_result(scene):
    import jax

    from geo4d_tpu.alignment.init import init_from_group
    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner

    groups, pred_pts, conf, _, _ = scene
    G = groups.shape[0]
    with jax.default_device(jax.devices("cpu")[0]):
        cfg = AlignerConfig(n_iter=NITER, temporal_smoothing_weight=0.015,
                            translation_weight=1.0, schedule="linear",
                            shared_focal=True, bucket_groups=1)
        al = GroupAligner(
            groups, pred_pts.reshape(G, S, -1, 3), conf.reshape(G, S, -1),
            (H, W), config=cfg,
        )
        init_from_group(al, pred_pts, conf)
        al.run()
        return {
            "poses": al.get_im_poses(),
            "focal": float(al.get_focals()[0]),
            "depths": al.get_depthmaps(),
        }


def _sim3_ate(est_poses, gt_poses):
    """Sim3-aligned APE RMSE of trajectory positions (our evals impl,
    itself pinned by closed-form fixtures in tests/test_evals.py)."""
    from geo4d_tpu.evals.trajectory import Trajectory, ape_translation_rmse

    ts = np.arange(len(gt_poses), dtype=np.float64)
    est = Trajectory.from_matrices(est_poses, ts)
    gt = Trajectory.from_matrices(gt_poses, ts)
    return ape_translation_rmse(est, gt)


def _traj_scale(gt_poses):
    c = gt_poses[:, :3, 3]
    return float(np.linalg.norm(c - c.mean(0), axis=1).mean())


def test_reference_recovers_scene(ref_result, scene):
    """Oracle sanity: the reference optimizer solves the synthetic scene."""
    *_, gt_poses, _ = scene
    ate = _sim3_ate(ref_result["poses"], gt_poses)
    assert ate < 0.08 * _traj_scale(gt_poses), f"reference ATE {ate}"
    assert abs(ref_result["focal"] - F_GT) / F_GT < 0.10


def test_ours_recovers_scene(our_result, scene):
    *_, gt_poses, _ = scene
    ate = _sim3_ate(our_result["poses"], gt_poses)
    assert ate < 0.08 * _traj_scale(gt_poses), f"our ATE {ate}"
    assert abs(our_result["focal"] - F_GT) / F_GT < 0.10


def test_trajectories_match_each_other(ref_result, our_result):
    """The two optimizers' solutions agree with each other (sim3-aligned) —
    the 'matching TUM trajectory' criterion: Adam trajectories differ
    iteration-by-iteration (different parameterizations/batching), but both
    must land on the same scene geometry."""
    ate = _sim3_ate(our_result["poses"], ref_result["poses"])
    scale = _traj_scale(ref_result["poses"])
    assert ate < 0.05 * scale, f"cross-ATE {ate} vs traj scale {scale}"
    assert (
        abs(our_result["focal"] - ref_result["focal"]) / ref_result["focal"]
        < 0.08
    )


def test_depths_match_scale_aligned(ref_result, our_result, scene):
    """Median-scale-aligned depth agreement per frame, both vs GT and
    cross-implementation (each side's scale is its own sim3 gauge)."""
    *_, depths_gt = scene

    def med_align(d, ref):
        return d * np.median(ref) / np.median(d)

    for i in range(N):
        ours = med_align(our_result["depths"][i], depths_gt[i])
        refd = med_align(ref_result["depths"][i], depths_gt[i])
        rel_ours = np.abs(ours - depths_gt[i]) / depths_gt[i]
        rel_cross = np.abs(ours - refd) / depths_gt[i]
        assert np.median(rel_ours) < 0.05, f"frame {i}: ours vs GT"
        assert np.median(rel_cross) < 0.05, f"frame {i}: ours vs reference"
