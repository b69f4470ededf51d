"""Mesh/sharding tests on the 8 virtual CPU devices (coexisting with the
TPU backend; conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geo4d_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    shard_params_fsdp,
)


def cpu_mesh(n=8):
    """Production path: make_mesh over the virtual CPU devices."""
    return make_mesh(n, platform="cpu")


def test_make_mesh_shapes():
    mesh = cpu_mesh(8)
    assert mesh.shape["data"] == 8
    assert mesh.size == 8
    assert all(d.platform == "cpu" for d in mesh.devices.flat)


def test_make_mesh_explicit_devices():
    devs = jax.devices("cpu")
    mesh = make_mesh(4, devices=devs)
    assert mesh.size == 4
    assert list(mesh.devices.flat) == devs[:4]


def test_make_mesh_too_many_devices_raises():
    # a silently smaller mesh would fake multi-chip semantics (round-1 bug)
    with pytest.raises(ValueError, match="device"):
        make_mesh(128, platform="cpu")


def test_dryrun_train_step_through_production_path():
    """The driver-checked dp train step, via make_mesh itself (2 devices to
    keep the 1-vCPU XLA:CPU compile small)."""
    import __graft_entry__ as ge

    cpus = jax.devices("cpu")[:2]
    mesh = make_mesh(2, devices=cpus)
    ge._dp_train_dryrun(mesh, 2, cpus)


def test_dryrun_window_predictor_on_mesh():
    """WindowPredictor with windows sharded over a 2-device CPU mesh —
    the flagship window-parallel inference path (infer_geo4d.py:412-418)."""
    import __graft_entry__ as ge

    cpus = jax.devices("cpu")[:2]
    mesh = make_mesh(2, devices=cpus)
    ge._window_parallel_dryrun(mesh, 2, cpus)


def test_batch_sharding_distributes():
    mesh = cpu_mesh(8)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, shard_batch(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 4)

    # a jitted elementwise+reduce op over the sharded batch
    f = jax.jit(lambda x: jnp.sum(x * 2, axis=1))
    out = f(xs)
    assert np.allclose(np.asarray(out), np.asarray(x).sum(1) * 2)


def test_replicated_params_with_sharded_batch():
    mesh = cpu_mesh(8)
    w = jax.device_put(jnp.ones((4, 3)), replicated(mesh))
    x = jax.device_put(jnp.ones((8, 4)), shard_batch(mesh))
    y = jax.jit(lambda w, x: x @ w)(w, x)
    assert y.shape == (8, 3)
    assert np.allclose(np.asarray(y), 4.0)


def test_fsdp_sharding_layout():
    mesh = cpu_mesh(8)
    params = {
        "big": jnp.zeros((1024, 512)),     # sharded (>= min_size)
        "small": jnp.zeros((16,)),         # replicated
        "odd": jnp.zeros((17, 33)),        # not divisible -> replicated
    }
    shardings = shard_params_fsdp(mesh, params, min_size=1024)
    big_spec = shardings["big"].spec
    assert "data" in big_spec
    assert shardings["small"].spec == P()
    assert shardings["odd"].spec == P()
    placed = jax.device_put(params, shardings)
    assert len(placed["big"].addressable_shards) == 8
    shard_shape = placed["big"].addressable_shards[0].data.shape
    assert shard_shape in ((128, 512), (1024, 64))


def test_window_sharded_gradient_psum():
    """Data-parallel grad: sharded batch, replicated params — grads match
    the single-device result (XLA inserts the psum)."""
    mesh = cpu_mesh(4)
    w = jnp.asarray(np.random.default_rng(0).normal(size=(6, 1)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 6)), jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    ws = jax.device_put(w, replicated(mesh))
    xs = jax.device_put(x, shard_batch(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    assert np.allclose(np.asarray(g_sharded), np.asarray(g_ref), atol=1e-5)


# ----------------------------------------------------------------------
# Multi-device NUMERICAL EQUIVALENCE (VERDICT r4 item 9): sharded runs
# must produce the single-device result, not merely valid shardings.
# ----------------------------------------------------------------------


def test_window_parallel_numerically_equals_single_device():
    """predict_windows on a 2-device mesh == the unsharded run, same RNG.

    Both sides use window_batch=2 so the key-split sequence is identical
    (one launch each); x_T is injected so even the initial noise is shared
    byte-for-byte. Any partitioning bug (wrong axis, dropped shard, psum
    where none belongs) produces O(1) diffs."""
    from geo4d_tpu.models import presets
    from geo4d_tpu.pipeline.inference import InferenceConfig, WindowPredictor

    T, H, W = 4, 32, 32
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        model = presets.tiny(temporal_length=T)
        params = presets.init_params(
            model, jax.random.PRNGKey(0), (H, W), temporal_length=T,
            with_text=False,
        )
        rng = np.random.default_rng(5)
        frames = rng.uniform(-1, 1, (2, T, H, W, 3)).astype(np.float32)
        x_T = rng.standard_normal((2, T, H // 8, W // 8, 16)).astype(np.float32)
        text_ctx = rng.normal(size=(1, 77, model.unet.context_dim)).astype(
            np.float32
        )
        cfg = InferenceConfig(window=T, ddim_steps=2, window_batch=2)

        single = WindowPredictor(model, params, cfg).predict_windows(
            frames, text_ctx, fps=24, seed=7, x_T=x_T
        )
        mesh = make_mesh(2, devices=cpus[:2])
        sharded = WindowPredictor(
            model, params, cfg, mesh=mesh
        ).predict_windows(frames, text_ctx, fps=24, seed=7, x_T=x_T)

    assert np.std(np.asarray(single["pts3d"])) > 1e-4  # non-degenerate
    for k in ("pts3d", "conf", "inv_depth", "traj"):
        d = np.max(np.abs(np.asarray(single[k]) - np.asarray(sharded[k])))
        # f32 reduction reorder across shards only; a partitioning bug is O(1)
        assert d < 5e-4, f"{k}: sharded vs single-device diff {d}"


def _tiny_train_setup(B, T=2, H=8, W=8):
    from geo4d_tpu.core.schedules import DiffusionSchedule
    from geo4d_tpu.models.unet3d import UNet3D
    from geo4d_tpu.training.step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    unet = UNet3D(
        model_channels=16, num_res_blocks=1, attention_resolutions=(1,),
        channel_mult=(1,), num_head_channels=8, context_dim=16,
        temporal_length=T, addition_attention=False, temporal_conv=False,
        dropout=0.0,
    )
    x = jnp.zeros((B, T, H, W, 20), jnp.float32)
    ts = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 77 + T * 16, 16), jnp.float32)
    fs = jnp.zeros((B,), jnp.int32)
    params = jax.jit(lambda k: unet.init(k, x, ts, ctx, fs))(
        jax.random.PRNGKey(0)
    )
    cfg = TrainConfig(temporal_length=T)
    state = create_train_state(params, cfg)
    step = make_train_step(lambda p, *a: unet.apply(p, *a),
                           DiffusionSchedule.create(), cfg)
    rng = np.random.default_rng(3)
    batch = {
        "z0": jnp.asarray(rng.normal(size=(B, T, H, W, 16)), jnp.float32),
        "c_concat": jnp.asarray(rng.normal(size=(B, T, H, W, 4)), jnp.float32),
        "context": jnp.asarray(
            rng.normal(size=(B, 77 + T * 16, 16)), jnp.float32
        ),
        "fs": jnp.full((B,), 24, jnp.int32),
    }
    return state, step, batch


def test_fsdp_train_step_equals_replicated():
    """One train step with FSDP-sharded state == the replicated-state step
    (same batch, same rng): params after update and the loss must match to
    f32 reduction tolerance. Closes the loop on test_fsdp_sharding_layout,
    which only checks WHERE leaves live."""
    cpus = jax.devices("cpu")
    mesh = make_mesh(4, devices=cpus[:4])
    B = 4
    with jax.default_device(cpus[0]):
        state, step, batch = _tiny_train_setup(B)
        key = jax.random.PRNGKey(11)

        repl = replicated(mesh)
        batch_shard = shard_batch(mesh)
        batch_s = {
            k: jax.device_put(v, batch_shard if v.ndim else repl)
            for k, v in batch.items()
        }

        # (a) replicated params
        state_r = jax.device_put(state, repl)
        with mesh:
            new_r, metrics_r = jax.jit(step)(state_r, batch_s, key)
            jax.block_until_ready(new_r.params)

        # (b) FSDP-sharded params/opt state
        param_spec = shard_params_fsdp(mesh, state.params, min_size=1)
        spec_by_shape = {
            p.shape: s
            for p, s in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(param_spec))
        }
        state_f = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(
                leaf, spec_by_shape.get(getattr(leaf, "shape", None), repl)
            ),
            state,
        )
        with mesh:
            new_f, metrics_f = jax.jit(step)(state_f, batch_s, key)
            jax.block_until_ready(new_f.params)

        n_sharded = sum(
            1 for p in jax.tree_util.tree_leaves(new_f.params)
            if p.addressable_shards[0].data.shape != p.shape
        )
        assert n_sharded > 0, "FSDP run did not actually shard anything"

    assert abs(float(metrics_r["loss_simple"])
               - float(metrics_f["loss_simple"])) < 1e-6
    for pr, pf in zip(jax.tree_util.tree_leaves(new_r.params),
                      jax.tree_util.tree_leaves(new_f.params)):
        d = float(jnp.max(jnp.abs(pr - pf)))
        assert d < 1e-5, f"param divergence {d} between FSDP and replicated"
