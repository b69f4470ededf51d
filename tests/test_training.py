"""Training step + modality builder tests (tiny model)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.core.schedules import DiffusionSchedule
from geo4d_tpu.models.presets import init_params, tiny
from geo4d_tpu.training.modalities import build_batch
from geo4d_tpu.training.step import (
    TrainConfig,
    create_train_state,
    diffusion_loss,
    geometry_condition_patterns,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_train():
    T = 4
    model = tiny(temporal_length=T)
    H, W = 32, 32
    params = init_params(model, jax.random.PRNGKey(0), (H, W), temporal_length=T)
    return model, params, (H, W, T)


def test_geometry_condition_patterns():
    p = geometry_condition_patterns(16)
    assert p.shape == (27, 16)
    assert np.all(p[:18] == 1)               # 18 all-noised rows
    assert p[18, 0] == 0 and p[18, 1] == 1   # first-frame-clean row
    assert np.all(p[26, :12] == 0) and np.all(p[26, 12:] == 1)


def test_modality_builder_shapes(tiny_train):
    model, params, (H, W, T) = tiny_train
    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "normed_allpts": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "plucker_raymap": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "plucker_cross": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "inverse_depth": jnp.asarray(rng.uniform(size=(B, T, H, W, 1)), jnp.float32),
        "video": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "fps": jnp.full((B,), 24, jnp.int32),
    }
    ctx_dim = model.unet.context_dim
    prompt = jnp.zeros((B, 77, ctx_dim))
    null_p = jnp.zeros((1, 77, ctx_dim))
    out = jax.jit(
        lambda p, b, k: build_batch(
            "pc_ray_cross_depth", model, p, b, k, prompt, null_p
        )
    )(params, batch, jax.random.PRNGKey(1))
    assert out["z0"].shape == (B, T, H // 8, W // 8, 16)
    assert out["c_concat"].shape == (B, T, H // 8, W // 8, 4)
    assert out["context"].shape == (B, 77 + T * 16, ctx_dim)
    # pc_ray: 8 channels
    out8 = jax.jit(
        lambda p, b, k: build_batch("pc_ray", model, p, b, k, prompt, null_p)
    )(params, batch, jax.random.PRNGKey(1))
    assert out8["z0"].shape == (B, T, H // 8, W // 8, 8)


def test_modality_builder_shapes_extended(tiny_train):
    """The four round-3 builders: pc_task (ddpm3d.py:1367), multimodality
    (:1772), novelview (:1883), multipc_dynamic (:2130)."""
    model, params, (H, W, T) = tiny_train
    rng = np.random.default_rng(0)
    B, V = 2, 2
    h, w = H // 8, W // 8
    ctx_dim = model.unet.context_dim
    prompt = jnp.zeros((B, 77, ctx_dim))
    null_p = jnp.zeros((1, 77, ctx_dim))
    key = jax.random.PRNGKey(1)

    def run(modality, batch):
        return jax.jit(
            lambda p, b, k: build_batch(modality, model, p, b, k, prompt, null_p)
        )(params, batch, key)

    vid = jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32)
    fps = jnp.full((B,), 24, jnp.int32)

    # pc_task: pc builder + integer task ids routed through the batch
    out = run("pc_task", {
        "normed_allpts": vid, "video": vid, "fps": fps,
        "task": jnp.array([0, 3]),
    })
    assert out["z0"].shape == (B, T, h, w, 4)
    assert out["task"].shape == (B,) and out["task"].dtype == jnp.int32

    # multimodality: [pc | normal | flow | objcoord] -> 16ch; accepts the
    # reference's misspelled 'objectcooridnate' batch key (ddpm3d.py:1789)
    out = run("multimodality", {
        "normed_allpts": vid, "normalmap": vid, "opticalflow": vid,
        "objectcooridnate": vid, "video": vid, "fps": fps,
    })
    assert out["z0"].shape == (B, T, h, w, 16)
    assert out["c_concat"].shape == (B, T, h, w, 4)

    # novelview: V views stacked along time; z0 = [last-view pc | last-view
    # video] = 8ch, c_concat = [first-view video latent | last-view raymap]
    # = 4 + 7 = 11ch (ddpm3d.py:1988)
    vid2 = jnp.asarray(rng.normal(size=(B, V * T, H, W, 3)), jnp.float32)
    raymap_all = jnp.asarray(rng.normal(size=(B, V * T, h, w, 7)), jnp.float32)
    out = jax.jit(
        lambda p, b, k: build_batch(
            "novelview", model, p, b, k, prompt, null_p, temporal_length=T
        )
    )(params, {
        "normed_allpts": vid2, "video": vid2,
        "plucker_raymap_all": raymap_all, "fps": fps,
    }, key)
    assert out["z0"].shape == (B, T, h, w, 8)
    assert out["c_concat"].shape == (B, T, h, w, 11)
    assert out["context"].shape == (B, 77 + T * 16, ctx_dim)

    # multipc_dynamic (V=2): z0 = [2x pc | 2x dynmask | 1x other-view video]
    # = 20ch, c_concat = first-view video latent (ddpm3d.py:2237)
    out = jax.jit(
        lambda p, b, k: build_batch(
            "multipc_dynamic", model, p, b, k, prompt, null_p,
            temporal_length=T,
        )
    )(params, {
        "normed_allpts": vid2, "dynamic_mask": vid2, "video": vid2,
        "fps": fps,
    }, key)
    assert out["z0"].shape == (B, T, h, w, V * 4 + V * 4 + (V - 1) * 4)
    assert out["c_concat"].shape == (B, T, h, w, 4)


def test_train_step_decreases_loss(tiny_train):
    model, params, (H, W, T) = tiny_train
    cfg = TrainConfig(learning_rate=1e-3, temporal_length=T)
    # rescale-free schedule keeps the fixed-batch progress check stable;
    # dynamic-rescale semantics are pinned by test_dynamic_rescale_scales_x_start
    schedule = DiffusionSchedule.create(use_dynamic_rescale=False)
    state = create_train_state(params["unet"], cfg)
    step = jax.jit(
        make_train_step(lambda p, *a: model.unet.apply(p, *a), schedule, cfg)
    )
    B = 2
    rng = np.random.default_rng(0)
    batch = {
        "z0": jnp.asarray(rng.normal(size=(B, T, 4, 4, 16)), jnp.float32),
        "c_concat": jnp.asarray(rng.normal(size=(B, T, 4, 4, 4)), jnp.float32),
        "context": jnp.zeros((B, 77 + T * 16, model.unet.context_dim)),
        "fs": jnp.full((B,), 24, jnp.int32),
    }
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_simple"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    # training on a fixed batch must make progress
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def _zero_unet(p, x, ts, ctx, fs):
    return jnp.zeros(x.shape[:-1] + (16,), x.dtype)


def _loss_batch(B, T, rng):
    return {
        "z0": jnp.asarray(rng.normal(size=(B, T, 4, 4, 16)), jnp.float32),
        "c_concat": jnp.zeros((B, T, 4, 4, 4)),
        "context": jnp.zeros((B, 77 + T * 16, 16)),
        "fs": jnp.full((B,), 24, jnp.int32),
    }


def test_dynamic_rescale_scales_x_start():
    """scale_arr must multiply x_start before q_sample (ddpm3d.py:987-993):
    with scale_arr == 0 the loss is independent of z0."""
    import dataclasses as dc

    schedule = DiffusionSchedule.create()
    zeroed = dc.replace(
        schedule, scale_arr=np.zeros(schedule.num_timesteps, np.float32)
    )
    T = 4
    cfg = TrainConfig(temporal_length=T)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    from geo4d_tpu.training.step import diffusion_loss as dl

    b1 = _loss_batch(2, T, np.random.default_rng(1))
    b2 = _loss_batch(2, T, np.random.default_rng(2))
    l1, _ = dl(_zero_unet, {}, zeroed, b1, key, cfg)
    l2, _ = dl(_zero_unet, {}, zeroed, b2, key, cfg)
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    # sanity: with the real (nonzero) scale_arr the z0 dependence is back
    l3, _ = dl(_zero_unet, {}, schedule, b1, key, cfg)
    l4, _ = dl(_zero_unet, {}, schedule, b2, key, cfg)
    assert not np.allclose(float(l3), float(l4))


def test_timestep_sampling_ranges():
    """Noised t ~ U[0, num_timesteps) regardless of low_timesteps; with
    geometry_condition, conditioning frames get t_low ~ U[0, low_timesteps)
    (ddpm3d.py:978-986)."""
    captured = {}

    def capture_unet(p, x, ts, ctx, fs):
        captured["ts"] = ts
        return jnp.zeros(x.shape[:-1] + (16,), x.dtype)

    T, B = 8, 128
    schedule = DiffusionSchedule.create()
    batch = _loss_batch(B, T, np.random.default_rng(0))

    # 1D path: low_timesteps must NOT clip the lower bound of ts
    cfg = TrainConfig(temporal_length=T, low_timesteps=900)
    diffusion_loss(capture_unet, {}, schedule, batch, jax.random.PRNGKey(0), cfg)
    ts = np.asarray(captured["ts"])
    assert ts.shape == (B,)
    assert ts.min() < 900 and ts.max() < 1000

    # 2D geometry-condition path
    cfg = TrainConfig(
        temporal_length=T, geometry_condition=True, low_timesteps=100
    )
    diffusion_loss(capture_unet, {}, schedule, batch, jax.random.PRNGKey(1), cfg)
    ts2d = np.asarray(captured["ts"])
    assert ts2d.shape == (B, T)
    assert (ts2d >= 0).all() and (ts2d < 1000).all()
    saw_nonzero_low = False
    for row in ts2d:
        vals = np.unique(row)
        assert len(vals) <= 2  # {t_noised, t_low}
        if len(vals) == 2:
            assert vals[0] < 100  # conditioning-frame timestep stays low
            saw_nonzero_low |= vals[0] > 0
    # reference samples t_low from U[0,100), not pinned at 0
    assert saw_nonzero_low


def test_ema_tracks_params(tiny_train):
    model, params, (H, W, T) = tiny_train
    cfg = TrainConfig(learning_rate=1e-3, temporal_length=T, ema_warmup=True)
    schedule = DiffusionSchedule.create()
    state = create_train_state(params["unet"], cfg)
    step = jax.jit(
        make_train_step(lambda p, *a: model.unet.apply(p, *a), schedule, cfg)
    )
    batch = {
        "z0": jnp.ones((1, T, 4, 4, 16)),
        "c_concat": jnp.ones((1, T, 4, 4, 4)),
        "context": jnp.zeros((1, 77 + T * 16, model.unet.context_dim)),
        "fs": jnp.full((1,), 24, jnp.int32),
    }
    s1, _ = step(state, batch, jax.random.PRNGKey(0))
    # with warmup, decay at step 1 = min(.9999, 2/11) -> EMA moves fast
    new = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(s1.params)])
    ema = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(s1.ema_params)])
    old = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(state.params)])
    assert not np.allclose(new, old)  # step moved the params
    # ema sits between old and new, closer to new (warmup decay 2/11)
    d_new = np.abs(ema - new).mean()
    d_old = np.abs(ema - old).mean()
    assert d_new < d_old


def test_trainstate_checkpoint_roundtrip(tmp_path):
    """Full-TrainState save/restore (the --resume path): params, EMA,
    Adam moments and step survive orbax round trip exactly."""
    from geo4d_tpu.models.checkpoint import restore_checkpoint, save_checkpoint
    from geo4d_tpu.training.step import TrainConfig, create_train_state

    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    state = create_train_state(params, TrainConfig())
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "state_latest")
    save_checkpoint(path, state)

    template = create_train_state(
        {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}, TrainConfig()
    )
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 7
    assert np.allclose(restored.params["w"], params["w"])
    assert np.allclose(restored.ema_params["b"], params["b"])


def test_npz_stream_resume_fast_forward(tmp_path):
    """Resuming with (start_epoch, skip_batches) continues the exact
    deterministic plan an uninterrupted stream would produce."""
    from geo4d_tpu.cli.train import npz_stream
    from geo4d_tpu.data.sampler import round_by

    t, hw = 2, 4
    for i in range(7):
        np.savez(
            tmp_path / f"clip_{i}.npz",
            video=np.full((t, hw, hw, 3), i, np.float32),
            normed_allpts=np.zeros((t, hw, hw, 3), np.float32),
            plucker_raymap=np.zeros((t, hw, hw, 3), np.float32),
            plucker_cross=np.zeros((t, hw, hw, 3), np.float32),
            inverse_depth=np.zeros((t, hw, hw, 1), np.float32),
            fps=24,
        )
    bs = 2
    bpe = round_by(7, bs) // bs  # 3 batches per epoch

    def ids(batch):
        return [int(v[0, 0, 0, 0]) for v in batch["video"]]

    full = npz_stream(str(tmp_path), bs, t)
    uninterrupted = [ids(next(full)) for _ in range(7)]

    step0 = 4  # resume mid-epoch-1
    resumed = npz_stream(str(tmp_path), bs, t,
                         start_epoch=step0 // bpe, skip_batches=step0 % bpe)
    continued = [ids(next(resumed)) for _ in range(3)]
    assert continued == uninterrupted[step0: step0 + 3]
