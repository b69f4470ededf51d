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


def test_train_step_decreases_loss(tiny_train):
    model, params, (H, W, T) = tiny_train
    cfg = TrainConfig(learning_rate=1e-3, temporal_length=T)
    schedule = DiffusionSchedule.create()
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
