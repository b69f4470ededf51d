"""End-to-end pipeline smoke test on a tiny model + synthetic video.

Exercises: sliding windows -> CLIP/resampler conditioning -> VAE encode ->
DDIM scan -> 4-head decode -> masking/denorm -> Plücker cameras -> group
alignment -> results export contract (SURVEY.md §7 minimum slice).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.alignment.optimizer import AlignerConfig
from geo4d_tpu.data.video import sliding_windows
from geo4d_tpu.models.presets import init_params, tiny
from geo4d_tpu.pipeline.export import save_results_dir, write_pointcloud_glb
from geo4d_tpu.pipeline.inference import (
    InferenceConfig,
    WindowPredictor,
    reconstruct,
)


def test_sliding_windows_contract():
    # reference slice list semantics: stride starts + forced tail
    g = sliding_windows(24, window=16, stride=4)
    assert g.shape == (3, 16)
    assert g[0, 0] == 0 and g[-1, -1] == 23 and g[-1, 0] == 8
    g = sliding_windows(18, window=16, stride=4)
    assert [w[0] for w in g] == [0, 2]   # tail window forced at T-16
    g = sliding_windows(16, window=16, stride=4)
    assert g.shape == (1, 16)


@pytest.fixture(scope="module")
def tiny_setup():
    T = 4
    model = tiny(temporal_length=T)
    H, W = 32, 64
    params = init_params(model, jax.random.PRNGKey(0), (H, W), temporal_length=T)
    return model, params, (H, W, T)


def test_window_predictor_shapes(tiny_setup):
    model, params, (H, W, T) = tiny_setup
    # window_batch matches the reconstruct test so the persistent compile
    # cache dedupes the (identical-HLO) window function
    cfg = InferenceConfig(window=T, stride=2, ddim_steps=2, window_batch=1,
                          keep_plucker_maps=True)
    predictor = WindowPredictor(model, params, cfg)
    frames = np.random.default_rng(0).normal(scale=0.3, size=(3, T, H, W, 3)).astype(
        np.float32
    )
    text_ctx = np.zeros((1, 77, model.unet.context_dim), np.float32)
    out = predictor.predict_windows(frames, text_ctx, fps=24)
    assert out["pts3d"].shape == (3, T, H, W, 3)
    assert out["conf"].shape == (3, T, H, W)
    assert out["raymap"].shape == (3, T, H, W, 3)
    assert out["inv_depth"].shape == (3, T, H, W)
    assert out["traj"].shape == (3, T, 4, 4)
    assert np.all(np.isfinite(out["pts3d"]))
    # conf is inverse-softplus-confidence: non-negative, 0 where invalid
    assert out["conf"].min() >= 0.0


def test_cfg_branches(tiny_setup):
    """2-way and 3-way CFG run end-to-end through the window predictor with
    an empty-prompt uncond context (test_geo4d.py:172-199 +
    ddim_multiplecond.py:220-234). cfg=1 vs cfg=2 must differ (the guidance
    is live), and all branches must stay finite."""
    model, params, (H, W, T) = tiny_setup
    # randomize zero-init tails (out convs) so the UNet output is nonzero —
    # otherwise every CFG combination of a zero output is identically zero
    rng_fill = np.random.default_rng(7)

    def fill_zeros(leaf):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and a.size and not a.any():
            return rng_fill.normal(scale=0.05, size=a.shape).astype(a.dtype)
        return leaf

    params = dict(params)
    params["unet"] = jax.tree_util.tree_map(fill_zeros, params["unet"])

    frames = np.random.default_rng(2).normal(
        scale=0.3, size=(1, T, H, W, 3)
    ).astype(np.float32)
    text_ctx = np.random.default_rng(3).normal(
        scale=0.1, size=(1, 77, model.unet.context_dim)
    ).astype(np.float32)
    uc_text = np.zeros_like(text_ctx)

    outs = {}
    for name, cfgkw in [
        ("nocfg", dict(cfg_scale=1.0)),
        ("cfg2", dict(cfg_scale=2.0)),
        ("multicond", dict(cfg_scale=2.0, cfg_img=1.5)),
    ]:
        cfg = InferenceConfig(window=T, stride=2, ddim_steps=2, **cfgkw)
        predictor = WindowPredictor(model, params, cfg)
        out = predictor.predict_windows(
            frames, text_ctx, fps=24, uncond_text_ctx=uc_text
        )
        assert out["pts3d"].shape == (1, T, H, W, 3)
        assert np.isfinite(out["pts3d"]).all(), name
        outs[name] = out["pts3d"]
    assert not np.allclose(outs["nocfg"], outs["cfg2"])
    assert not np.allclose(outs["cfg2"], outs["multicond"])


def test_full_reconstruct_and_export(tiny_setup, tmp_path):
    model, params, (H, W, T) = tiny_setup
    frames = np.random.default_rng(1).normal(scale=0.3, size=(8, H, W, 3)).astype(
        np.float32
    )
    text_ctx = np.zeros((1, 77, model.unet.context_dim), np.float32)
    icfg = InferenceConfig(window=T, stride=2, ddim_steps=2)
    acfg = AlignerConfig(n_iter=10, depth_traj_start_iter=5)
    scene, preds, timing = reconstruct(
        model, params, frames, text_ctx, fps=24,
        inference_config=icfg, aligner_config=acfg,
    )
    assert timing["sec_per_frame"] > 0
    out_dir = str(tmp_path / "seq")
    save_results_dir(out_dir, scene, rgb_frames=frames)
    # the exact viser-readable contract
    for fname in [
        "pred_traj.txt", "pred_focal.txt", "pred_intrinsics.txt",
        "frame_0000.npy", "conf_0000.npy", "init_conf_0000.npy",
        "frame_0000.png", "scene.glb",
    ]:
        assert os.path.exists(os.path.join(out_dir, fname)), fname
    traj = np.loadtxt(os.path.join(out_dir, "pred_traj.txt"))
    assert traj.shape == (8, 8)
    K = np.loadtxt(os.path.join(out_dir, "pred_intrinsics.txt"))
    assert K.shape == (8, 9)


def test_glb_writer(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "pc.glb")
    write_pointcloud_glb(path, pts, cols)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"glTF"
    import struct

    magic, version, total = struct.unpack("<III", data[:12])
    assert version == 2 and total == len(data)


def test_predict_video_matches_predict_windows(tiny_setup):
    """The deduped unique-frame path (predict_video: CLIP/VAE-encode each
    frame once, gather into windows) must produce exactly what the
    per-window-stack path does, and return_device must change only the
    array type. Posterior sampling is disabled (mode): the two paths
    deliberately draw encode noise differently (per unique frame vs per
    window-frame) — everything else must be bit-for-bit comparable."""
    model, params, (H, W, T) = tiny_setup
    cfg = InferenceConfig(window=T, stride=2, ddim_steps=2, window_batch=1,
                          sample_posterior=False)
    predictor = WindowPredictor(model, params, cfg)
    frames = np.random.default_rng(3).normal(
        scale=0.3, size=(T + 4, H, W, 3)
    ).astype(np.float32)
    groups = sliding_windows(T + 4, T, 2)
    text_ctx = np.zeros((1, 77, model.unet.context_dim), np.float32)

    out_w = predictor.predict_windows(frames[groups], text_ctx, fps=24, seed=5)
    out_v = predictor.predict_video(frames, groups, text_ctx, fps=24, seed=5)
    out_d = predictor.predict_video(frames, groups, text_ctx, fps=24, seed=5,
                                    return_device=True)
    for k in out_w:
        assert np.allclose(out_w[k], out_v[k], atol=1e-5), k
        assert np.allclose(out_w[k], np.asarray(out_d[k]), atol=1e-5), k
    import jax

    assert isinstance(out_d["pts3d"], jax.Array)


def test_uint8_ingest_bit_identical(tiny_setup):
    """uint8 frames (raw_uint8 ingest, normalized in-jit with the host
    expression) must produce bit-identical outputs to the host-normalized
    f32 path — the normalization arithmetic is the same f32 expression."""
    model, params, (H, W, T) = tiny_setup
    cfg = InferenceConfig(window=T, stride=2, ddim_steps=2, window_batch=1)
    predictor = WindowPredictor(model, params, cfg)
    frames_u8 = np.random.default_rng(7).integers(
        0, 256, size=(T + 4, H, W, 3), dtype=np.uint8
    )
    frames_f32 = (frames_u8.astype(np.float32) / 255.0 - 0.5) * 2.0
    groups = sliding_windows(T + 4, T, 2)
    text_ctx = np.zeros((1, 77, model.unet.context_dim), np.float32)

    out_f = predictor.predict_video(frames_f32, groups, text_ctx, fps=24, seed=5)
    out_u = predictor.predict_video(frames_u8, groups, text_ctx, fps=24, seed=5)
    for k in out_f:
        np.testing.assert_array_equal(out_f[k], out_u[k], err_msg=k)
