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
