"""Test harness config.

This box has ONE vCPU — XLA:CPU compiles of large graphs are minutes-slow —
so tests run on the default backend (the TPU chip when available, with fast
remote compiles) and only mesh/sharding tests use the 8 virtual CPU devices
(which coexist with the TPU backend via --xla_force_host_platform_device_count;
SURVEY.md §4 test strategy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402  (import after env is set)

# config.update, not env vars: the host sitecustomize imports jax at
# interpreter startup, so env set here would be ignored.  The repo-local dir
# is shared with bench.py — test compiles of the production shapes prime the
# bench and vice versa.
from geo4d_tpu.core.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
)

# keep f32 matmuls at f32 accuracy on the MXU so numeric tests hold on TPU
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n: int = 8):
    """The virtual CPU mesh devices for sharding tests."""
    return jax.devices("cpu")[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
