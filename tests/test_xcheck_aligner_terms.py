"""Per-TERM numerical parity of the alignment loss vs the reference forward.

VERDICT r4 weak item 4: the behavioral aligner cross-check
(tests/test_xcheck_aligner.py) gates on ATE/focal recovery, which a
mis-scaled loss term (e.g. the x2 invdepth weight or the 0.005 traj weight
off by 2x) could still pass. Here IDENTICAL parameters are written into
both optimizers (poses, log-depths, shared focal, per-window sim3s,
per-group disparity (s,t), per-group trajectory sim3s) and each loss term
of /root/reference/dust3r/cloud_opt/optimizer_group.py `forward`
(:440-525) is isolated by config/gate differencing and compared to 1e-4:

  point   conf-weighted L1 point consistency (:451-459)
  smooth  temporal pose smoothness x weight   (:517-521)
  depth   x2 inverse-depth consistency        (:465-488)
  traj    0.005 x trajectory alignment        (:492-514)
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _refstubs  # noqa: E402

_refstubs.install()

from test_xcheck_aligner import _make_scene, F_GT, H, W, N, S  # noqa: E402

pytestmark = pytest.mark.slow

SMOOTH_W = 0.015
TRANS_W = 1.0
REL_TOL = 1e-4


def _target_params(scene, seed=11):
    """One arbitrary-but-valid parameter set, away from any optimum so no
    term is degenerately zero."""
    from scipy.spatial.transform import Rotation

    groups, pred_pts, conf, gt_poses, depths = scene
    G = groups.shape[0]
    rng = np.random.default_rng(seed)

    poses_t = gt_poses.copy()
    for i in range(N):
        dR = Rotation.from_euler(
            "xyz", rng.normal(scale=0.02, size=3)
        ).as_matrix()
        poses_t[i, :3, :3] = poses_t[i, :3, :3] @ dR
        poses_t[i, :3, 3] += rng.normal(scale=0.03, size=3)

    depths_t = depths.reshape(N, -1) * np.exp(
        rng.normal(scale=0.05, size=(N, H * W))
    ).astype(np.float32)

    pw_s = np.array([1.2, 0.8, 1.5], np.float32)[:G]
    pw_R = np.stack([
        Rotation.from_euler("xyz", rng.normal(scale=0.05, size=3)).as_matrix()
        for _ in range(G)
    ]).astype(np.float32)
    pw_t = rng.normal(scale=0.1, size=(G, 3)).astype(np.float32)

    s_depth = np.array([1.1, 0.9, 1.3], np.float32)[:G]
    t_depth = np.array([0.02, -0.05, 0.1], np.float32)[:G]

    ta_P = np.stack([np.eye(4, dtype=np.float32) for _ in range(G)])
    for g in range(G):
        ta_P[g, :3, :3] = Rotation.from_euler(
            "xyz", rng.normal(scale=0.04, size=3)
        ).as_matrix()
        ta_P[g, :3, 3] = rng.normal(scale=0.08, size=3)
    ta_s = np.array([1.05, 0.95, 1.2], np.float32)[:G]

    # diffusion inverse depth in [0, 1] with a below-threshold patch so the
    # 0.05 validity mask is exercised
    invd = (1.0 / depths[groups]).astype(np.float32)      # (G, S, H, W)
    invd[:, :, : H // 8, : W // 8] = 0.01
    # per-window diffusion cameras: GT poses of the window frames, perturbed
    trajs = gt_poses[groups].copy()                       # (G, S, 4, 4)
    trajs[:, :, :3, 3] += rng.normal(scale=0.02,
                                     size=(G, S, 3)).astype(np.float32)

    return dict(poses=poses_t, depths=depths_t, focal=47.0,
                pw_s=pw_s, pw_R=pw_R, pw_t=pw_t,
                s_depth=s_depth, t_depth=t_depth, ta_P=ta_P, ta_s=ta_s,
                invd=invd, trajs=trajs)


@pytest.fixture(scope="module")
def scene():
    return _make_scene()


@pytest.fixture(scope="module")
def tp(scene):
    return _target_params(scene)


def _ref_scene(scene, tp, smoothing, with_depth_traj):
    """Reference optimizer with the target params written in."""
    from dust3r.cloud_opt.optimizer_group import LightPointCloudGroupOptimizer

    groups, pred_pts, conf, _, _ = scene
    G = groups.shape[0]
    view_list = [
        [{"img": torch.zeros(3, H, W), "idx": (int(i),)} for i in groups[g]]
        for g in range(G)
    ]
    pred_list = []
    for g in range(G):
        entry = {
            "pts3d": torch.from_numpy(pred_pts[g]),
            "conf": torch.from_numpy(conf[g][..., None]),
        }
        if with_depth_traj:
            entry["inverse_depthmap"] = torch.from_numpy(
                tp["invd"][g][..., None]
            )
            entry["traj"] = torch.from_numpy(tp["trajs"][g])
        pred_list.append(entry)
    sc = LightPointCloudGroupOptimizer(
        view_list, pred_list, conf="id", conf_optimize=True, verbose=False,
        shared_focal=True, flow_loss_weight=0.0, num_total_iter=500,
        temporal_smoothing_weight=smoothing, translation_weight=TRANS_W,
    )
    with torch.no_grad():
        for i in range(N):
            sc._set_pose(sc.im_poses, i,
                         torch.from_numpy(tp["poses"][i]), force=True)
        for i in range(N):
            sc._set_depthmap(
                i, torch.from_numpy(tp["depths"][i].reshape(H, W)),
                force=True,
            )
        sc._set_focal(0, tp["focal"], force=True)
        for g in range(G):
            # pw sim3: effective transform is [s*norm*R | s*norm*t]; the
            # reference stores signed_log1p(T/scale), so pass T = t*s
            # (base_opt_group.py:267-288, get_pw_poses :316-320)
            T4 = np.eye(4, dtype=np.float32)
            T4[:3, :3] = tp["pw_R"][g]
            T4[:3, 3] = tp["pw_t"][g] * tp["pw_s"][g]
            sc._set_pose(sc.pw_poses, g, torch.from_numpy(T4),
                         scale=float(tp["pw_s"][g]), force=True)
        if with_depth_traj:
            sc.s_depth.data[:, 0] = torch.from_numpy(tp["s_depth"])
            sc.t_depth.data[:, 0] = torch.from_numpy(tp["t_depth"])
            sc.invalid_depth_group = []
            for g in range(G):
                # traj sim3 stored with scale_T=False (_set_traj :260)
                sc._set_pose(sc.traj_align_poses, g,
                             torch.from_numpy(tp["ta_P"][g]),
                             scale=float(tp["ta_s"][g]), scale_T=False,
                             force=True)
    return sc


def _our_aligner(scene, tp, smoothing, with_depth_traj):
    import jax
    import jax.numpy as jnp

    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner

    groups, pred_pts, conf, _, _ = scene
    G = groups.shape[0]
    with jax.default_device(jax.devices("cpu")[0]):
        cfg = AlignerConfig(
            n_iter=500, temporal_smoothing_weight=smoothing,
            translation_weight=TRANS_W, shared_focal=True, bucket_groups=1,
            conf_optimize=True,
        )
        kw = {}
        if with_depth_traj:
            kw = dict(invdepth=jnp.asarray(tp["invd"].reshape(G, S, -1)),
                      trajs=jnp.asarray(tp["trajs"]))
        al = GroupAligner(
            groups, pred_pts.reshape(G, S, -1, 3), conf.reshape(G, S, -1),
            (H, W), config=cfg, **kw,
        )
        al.set_poses_all(tp["poses"])
        al.set_depthmaps_all(tp["depths"])
        al.preset_focal([tp["focal"]])
        al.set_pw_poses_all(tp["pw_s"], tp["pw_R"], tp["pw_t"])
        if with_depth_traj:
            import numpy as np2

            al.params["s_depth"] = jnp.asarray(
                np2.pad(tp["s_depth"], (0, al.Gp - G), constant_values=1.0))
            al.params["t_depth"] = jnp.asarray(
                np2.pad(tp["t_depth"], (0, al.Gp - G)))
            from geo4d_tpu.alignment.optimizer import pose_to_params

            ta = np2.asarray(al.params["traj_align"]).copy()
            for g in range(G):
                ta[g, :7] = np2.asarray(
                    pose_to_params(jnp.asarray(tp["ta_P"][g]))
                )
                ta[g, 7] = np2.log(tp["ta_s"][g])
            al.params["traj_align"] = jnp.asarray(ta)
            al.valid_depth_group = jnp.ones_like(al.valid_depth_group)
            al.valid_traj_group = jnp.ones_like(al.valid_traj_group)
    return al


@pytest.fixture(scope="module")
def terms(scene, tp):
    """(ours, reference) value of each loss term at identical parameters."""
    import jax

    groups = scene[0]
    G = groups.shape[0]

    # ---- reference: isolate terms by gate differencing ----
    with torch.no_grad():
        ref_p = float(_ref_scene(scene, tp, 0.0, False).forward(0))
        sc = _ref_scene(scene, tp, SMOOTH_W, True)
        ref_ps = float(sc.forward(0))           # point + smooth (epoch < 150)
        sc.valid_traj_group_list = []           # depth on, traj off
        ref_psd = float(sc.forward(9999))
        sc.valid_traj_group_list = list(range(G))
        sc.valid_group_idx = [int(j) for g in groups for j in g]
        ref_full = float(sc.forward(9999))

    # ---- ours ----
    with jax.default_device(jax.devices("cpu")[0]):
        al_p = _our_aligner(scene, tp, 0.0, False)
        our_p = float(al_p.loss_fn(al_p.params, use_depth_traj=False))
        al = _our_aligner(scene, tp, SMOOTH_W, True)
        our_ps = float(al.loss_fn(al.params, use_depth_traj=False))
        import jax.numpy as jnp

        saved = al.valid_traj_group
        al.valid_traj_group = jnp.zeros_like(saved)
        our_psd = float(al.loss_fn(al.params, use_depth_traj=True))
        al.valid_traj_group = saved
        our_full = float(al.loss_fn(al.params, use_depth_traj=True))

    return {
        "point": (our_p, ref_p),
        "smooth": (our_ps - our_p, ref_ps - ref_p),
        "depth": (our_psd - our_ps, ref_psd - ref_ps),
        "traj": (our_full - our_psd, ref_full - ref_psd),
    }


@pytest.mark.parametrize("term", ["point", "smooth", "depth", "traj"])
def test_loss_term_matches_reference(terms, term):
    ours, ref = terms[term]
    assert ref != 0.0, f"{term}: reference term degenerately zero"
    assert ours == pytest.approx(ref, rel=REL_TOL, abs=REL_TOL * abs(ref)), (
        f"{term}: ours {ours} vs reference {ref}"
    )


def test_term_magnitudes_sane(terms):
    """The x2 / 0.005 / 0.015 weights are visible in the magnitudes —
    a dropped weight would show up as a ~2x/200x/67x mismatch above, but
    assert the terms are individually nonzero and finite too."""
    for name, (ours, ref) in terms.items():
        assert np.isfinite(ours) and np.isfinite(ref), name
        assert abs(ours) > 1e-8, name
