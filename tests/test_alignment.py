"""Group aligner integration test on a synthetic multi-window scene.

Builds a ground-truth scene (smooth depth, moving camera, known focal),
fabricates per-window predictions by applying a random sim3 per window (the
exact ambiguity the aligner must undo), runs init + a short optimization,
and checks the recovered trajectory/depth against ground truth.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from geo4d_tpu.alignment.init import init_from_group
from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner
from geo4d_tpu.evals.trajectory import Trajectory, eval_metrics
from geo4d_tpu.evals.depth import depth_evaluation


def build_synthetic_scene(n_frames=8, h=24, w=32, focal=35.0, seed=0):
    rng = np.random.default_rng(seed)
    # smooth depth maps
    yy, xx = np.mgrid[:h, :w]
    depths = []
    for i in range(n_frames):
        d = 3.0 + 0.5 * np.sin(xx / 7 + i * 0.2) + 0.3 * np.cos(yy / 5)
        depths.append(d)
    depths = np.stack(depths)
    # slowly moving camera
    poses = []
    for i in range(n_frames):
        ang = 0.03 * i
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        t = np.array([0.1 * i, 0.02 * i, 0.05 * i])
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = t
        poses.append(P)
    poses = np.stack(poses)
    # unproject to world
    pts_world = []
    for i in range(n_frames):
        x = (xx - w / 2) / focal * depths[i]
        y = (yy - h / 2) / focal * depths[i]
        pc = np.stack([x, y, depths[i]], axis=-1).reshape(-1, 3)
        pw = pc @ poses[i, :3, :3].T + poses[i, :3, 3]
        pts_world.append(pw.reshape(h, w, 3))
    return np.stack(pts_world), poses, depths, focal


def make_window_preds(pts_world, poses, groups, seed=1):
    """Per-window predictions: true points in the window's FIRST camera
    frame, with a random per-window scale — the ambiguity the model's
    normalized outputs actually carry (each window is predicted in its
    first-frame camera coordinates up to scale)."""
    rng = np.random.default_rng(seed)
    G, S = groups.shape
    h, w = pts_world.shape[1:3]
    preds = np.zeros((G, S, h, w, 3))
    for g in range(G):
        s = rng.uniform(0.7, 1.5)
        c2w0 = poses[groups[g, 0]]
        R_w2c = c2w0[:3, :3].T
        t_w2c = -R_w2c @ c2w0[:3, 3]
        for s_idx, img_idx in enumerate(groups[g]):
            p = pts_world[img_idx].reshape(-1, 3)
            preds[g, s_idx] = (s * (p @ R_w2c.T + t_w2c)).reshape(h, w, 3)
    return preds


@pytest.fixture(scope="module")
def synthetic():
    pts_world, poses, depths, focal = build_synthetic_scene()
    groups = np.array([[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7]])
    preds = make_window_preds(pts_world, poses, groups)
    conf = np.ones(preds.shape[:-1])
    return pts_world, poses, depths, focal, groups, preds, conf


def test_init_recovers_geometry(synthetic):
    pts_world, poses, depths, focal, groups, preds, conf = synthetic
    h, w = depths.shape[1:]
    cfg = AlignerConfig(n_iter=0, depth_traj_start_iter=0,
                        temporal_smoothing_weight=0.0)
    aligner = GroupAligner(groups, preds, conf, (h, w), config=cfg)
    init_from_group(aligner, preds, conf, verbose=False)
    # focal should be near truth
    f = aligner.get_focals()[0]
    assert f == pytest.approx(focal, rel=0.2)
    # init loss should be small: windows registered consistently
    loss = float(aligner.loss_fn(aligner.params, False))
    assert loss < 0.1
    # trajectory ATE (up to global sim3) small
    est = Trajectory.from_matrices(aligner.get_im_poses())
    ref = Trajectory.from_matrices(poses)
    ate, _, _ = eval_metrics(est, ref)
    # scene scale ~ +/-0.35 translation range; ATE after sim3 align tiny
    assert ate < 0.05


def test_optimization_reduces_loss(synthetic):
    pts_world, poses, depths, focal, groups, preds, conf = synthetic
    h, w = depths.shape[1:]
    cfg = AlignerConfig(n_iter=60, depth_traj_start_iter=60, lr=0.01,
                        temporal_smoothing_weight=0.0)
    aligner = GroupAligner(groups, preds, conf, (h, w), config=cfg)
    init_from_group(aligner, preds, conf)
    loss0 = float(aligner.loss_fn(aligner.params, False))
    final = aligner.run()
    assert final < loss0
    # depth quality after optimization: scale-aligned AbsRel small
    pred_depth = aligner.get_depthmaps()
    out = depth_evaluation(pred_depth.ravel(), depths.ravel(), align="scale",
                           max_depth=None)
    assert out["Abs Rel"] < 0.05


def test_two_phase_with_depth_traj(synthetic):
    """Full two-phase run with inverse-depth + trajectory anchors."""
    pts_world, poses, depths, focal, groups, preds, conf = synthetic
    h, w = depths.shape[1:]
    G, S = groups.shape
    # diffusion inverse depth: true disparity, arbitrarily scaled per window
    invd = np.zeros((G, S, h, w))
    trajs = np.zeros((G, S, 4, 4))
    rng = np.random.default_rng(7)
    for g in range(G):
        sc = rng.uniform(0.5, 2.0)
        for s_idx, i in enumerate(groups[g]):
            invd[g, s_idx] = (1.0 / depths[i]) * sc
            trajs[g, s_idx] = poses[i]  # perfect relative cameras
    cfg = AlignerConfig(n_iter=40, depth_traj_start_iter=20, lr=0.005,
                        temporal_smoothing_weight=0.015)
    aligner = GroupAligner(groups, preds, conf, (h, w), invdepth=invd,
                           trajs=trajs, config=cfg)
    init_from_group(aligner, preds, conf)
    final = aligner.run()
    assert np.isfinite(final)
    # calibration found per-window disparity scales
    assert np.all(np.asarray(aligner.params["s_depth"]) > 0)
    # outputs honor the results contract shapes
    assert aligner.get_tum_poses().shape == (8, 8)
    assert aligner.get_depthmaps().shape == (8, h, w)
    assert aligner.get_intrinsics().shape == (8, 3, 3)
    assert aligner.get_pts3d().shape == (8, h, w, 3)


def test_bucketing_padding_is_invisible(rng):
    """Padded (bucketed) aligner must produce the same loss and the same
    optimized outputs as an unpadded one — padding exists only for compile
    reuse across sequences."""
    G, S, h, w = 3, 4, 8, 8
    groups = np.stack([np.arange(s, s + S) for s in range(0, 2 * G, 2)])
    N = int(groups.max()) + 1
    preds = rng.normal(size=(G, S, h * w, 3)).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, size=(G, S, h * w)).astype(np.float32)
    invd = rng.uniform(0.1, 0.9, size=(G, S, h * w)).astype(np.float32)

    outs = []
    for bg, bf in [(1, 1), (4, 8)]:
        cfg = AlignerConfig(
            n_iter=20, depth_traj_start_iter=10, lr=0.01,
            temporal_smoothing_weight=0.015, bucket_groups=bg, bucket_frames=bf,
        )
        al = GroupAligner(groups, preds, conf, (h, w), invdepth=invd, config=cfg)
        if bg == 1:
            assert al.Gp == G and al.Np == N
        else:
            assert al.Gp == 4 and al.Np == 8
        l0 = float(al.loss_fn(al.params, False))
        al.run()
        outs.append((l0, al.get_depthmaps(), al.get_im_poses()))
    (l0a, d_a, p_a), (l0b, d_b, p_b) = outs
    assert l0a == pytest.approx(l0b, rel=1e-5)
    assert np.allclose(d_a, d_b, rtol=1e-4, atol=1e-5)
    assert np.allclose(p_a, p_b, rtol=1e-4, atol=1e-5)


def test_flow_loss_and_cleanup_wiring(rng):
    """flow_loss_weight is live: supplying target flows changes the loss
    and the optimization; apply_cleanup rewrites im_conf in place."""
    G, S, h, w = 2, 4, 8, 8
    groups = np.stack([np.arange(s, s + S) for s in range(0, 2 * G, 2)])
    N = int(groups.max()) + 1
    preds = rng.normal(size=(G, S, h * w, 3)).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, size=(G, S, h * w)).astype(np.float32)
    flows = rng.normal(scale=2.0, size=(N - 1, h, w, 2)).astype(np.float32)

    base = AlignerConfig(n_iter=6, depth_traj_start_iter=3, bucket_groups=1,
                         bucket_frames=1)
    off = GroupAligner(groups, preds, conf, (h, w), config=base,
                       target_flows=flows)
    assert not off.has_flow  # weight 0 -> term inert

    cfg = AlignerConfig(n_iter=6, depth_traj_start_iter=3, bucket_groups=1,
                        bucket_frames=1, flow_loss_weight=0.5,
                        flow_loss_start_frac=0.0)
    on = GroupAligner(groups, preds, conf, (h, w), config=cfg,
                      target_flows=flows)
    assert on.has_flow
    l_off = float(off.loss_fn(off.params, False))
    l_on = float(on.loss_fn(on.params, False, iter_frac=1.0))
    assert l_on > l_off  # random target flows add positive flow error
    on.run()
    assert np.isfinite(on.get_depthmaps()).all()

    conf_before = on.get_conf().copy()
    on.apply_cleanup(bad_conf=0.0)
    after = on.get_conf()
    assert after.shape == conf_before.shape
    assert (after <= conf_before + 1e-6).all()  # cleanup only lowers conf


def test_postprocess_to_aligner_config_mapping():
    """An unmodified reference-layout postprocess block maps onto
    AlignerConfig (configs/inference_geo4d.yaml:169-186)."""
    from geo4d_tpu.cli.common import aligner_config_from_postprocess
    from geo4d_tpu.core.config import load_config

    pp = load_config("configs/inference_geo4d.yaml")["postprocess"]
    acfg = aligner_config_from_postprocess(pp)
    assert acfg.n_iter == 500
    assert acfg.temporal_smoothing_weight == 0.015
    assert acfg.shared_focal is True
    assert acfg.schedule == "linear"
    assert acfg.flow_loss_weight == 0.0
    assert acfg.motion_mask_thre == 0.35
    acfg2 = aligner_config_from_postprocess(
        {"flow_loss_fn": "smooth_l1", "not_shared_focal": True,
         "flow_loss_weight": 0.01}, n_iter=50,
    )
    assert acfg2.n_iter == 50 and acfg2.flow_loss_fn == "l1"
    assert acfg2.shared_focal is False and acfg2.flow_loss_weight == 0.01


def test_device_init_matches_host_init(synthetic):
    """Device-resident init (jax-array inputs) must land within init noise
    of the host chain (numpy inputs): same registration math, PnP on a
    stride-2 subsample instead of full res."""
    import jax.numpy as jnp

    pts_world, poses, depths, focal, groups, preds, conf = synthetic
    h, w = depths.shape[1:]
    G, S = groups.shape
    cfg = AlignerConfig(n_iter=0, depth_traj_start_iter=0,
                        temporal_smoothing_weight=0.0)

    host = GroupAligner(groups, preds, conf, (h, w), config=cfg)
    init_from_group(host, preds.reshape(G, S, h, w, 3),
                    conf.reshape(G, S, h, w))

    dev = GroupAligner(groups, jnp.asarray(preds), jnp.asarray(conf),
                       (h, w), config=cfg)
    init_from_group(dev, jnp.asarray(preds.reshape(G, S, h, w, 3)),
                    jnp.asarray(conf.reshape(G, S, h, w)))

    # both inits must explain the data comparably well
    l_host = float(host.loss_fn(host.params, False))
    l_dev = float(dev.loss_fn(dev.params, False))
    assert l_dev < max(2 * l_host, 0.1)
    # focal agreement (PnP subsample must not move the focal materially)
    f_host, f_dev = host.get_focals()[0], dev.get_focals()[0]
    assert abs(f_host - f_dev) / f_host < 0.1
    # depth maps broadly agree (same registration; PnP poses differ only
    # by subsample noise)
    d_host, d_dev = host.get_depthmaps(), dev.get_depthmaps()
    assert np.median(np.abs(d_host - d_dev) / np.abs(d_host)) < 0.05


def test_im_conf_lazy_and_init_snapshot(rng):
    """im_conf is fetched lazily; init_conf must snapshot the PRISTINE
    per-frame confidence even when cleanup overwrites im_conf first."""
    h, w = 8, 12
    groups = np.array([[0, 1], [1, 2]], np.int32)
    preds = rng.normal(size=(2, 2, h * w, 3)).astype(np.float32)
    conf = rng.uniform(0.1, 1.0, size=(2, 2, h * w)).astype(np.float32)
    cfg = AlignerConfig(n_iter=0, bucket_groups=1, bucket_frames=1)
    al = GroupAligner(groups, preds, conf, (h, w), config=cfg)
    assert al._im_conf is None  # not fetched by the ctor
    # reference value straight from the buffers
    ref = np.zeros((3, h * w), np.float32)
    for g in range(2):
        for s in range(2):
            ref[groups[g, s]] = np.maximum(ref[groups[g, s]], conf[g, s])
    got = al.im_conf
    assert np.allclose(got, ref, atol=1e-6)
    # overwrite via the setter (what apply_cleanup does) AFTER resetting
    # the lazy state: init_conf must still return the pristine values
    al2 = GroupAligner(groups, preds, conf, (h, w), config=cfg)
    al2.im_conf = np.zeros_like(ref)
    assert np.allclose(al2.init_conf, ref, atol=1e-6)
    assert np.allclose(al2.im_conf, 0.0)
