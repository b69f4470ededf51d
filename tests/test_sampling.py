"""DDIM sampler semantics: convergence with an oracle x0-predictor, CFG
branch stacking, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo4d_tpu.core.schedules import DiffusionSchedule
from geo4d_tpu.sampling.ddim import DDIMTables, ddim_sample


@pytest.fixture(scope="module")
def sched():
    # no dynamic rescale for the oracle test (rescale intentionally biases x0)
    return DiffusionSchedule.create(use_dynamic_rescale=False)


def test_oracle_x0_convergence(sched):
    """A model that always v-predicts toward a fixed x0 drives DDIM to x0."""
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 4, 4, 3)), jnp.float32)
    tables = DDIMTables.from_schedule(sched, 20, "uniform_trailing", 0.0)
    abar = jnp.asarray(sched.sqrt_alphas_cumprod)
    sb = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def model_fn(x, t, branches):
        # v such that pred_x0 == x0: v = (sa*x - x0) / sb
        sa_t, sb_t = abar[t], sb[t]
        return (sa_t * x - x0) / jnp.maximum(sb_t, 1e-8)

    out = ddim_sample(model_fn, x0.shape, tables, jax.random.PRNGKey(0))
    # final alpha_prev = abar[0] ~ 0.9993: out ~ sqrt(abar0)*x0 + small eps
    assert np.allclose(np.asarray(out), np.asarray(x0), atol=0.15)
    err = np.abs(np.asarray(out) - np.asarray(x0)).mean()
    assert err < 0.05


def test_cfg_branch_stacking(sched):
    """With cfg!=1 the model sees a 2x batch; cfg=1 sees 1x."""
    seen = {}
    tables = DDIMTables.from_schedule(sched, 3)

    def model_fn(x, t, branches):
        seen["batch"] = x.shape[0]
        seen["branches"] = branches
        return jnp.zeros_like(x)

    shape = (1, 2, 4, 4, 3)
    ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(0), cfg_scale=7.5)
    assert seen["batch"] == 2 and seen["branches"] == 2
    ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(0), cfg_scale=1.0)
    assert seen["batch"] == 1 and seen["branches"] == 1
    ddim_sample(
        model_fn, shape, tables, jax.random.PRNGKey(0), cfg_scale=7.5, cfg_img=2.0
    )
    assert seen["batch"] == 3 and seen["branches"] == 3


def test_determinism_eta0(sched):
    tables = DDIMTables.from_schedule(sched, 5)

    def model_fn(x, t, branches):
        return 0.1 * x

    shape = (1, 2, 4, 4, 3)
    a = ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(7))
    b = ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(7))
    c = ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(8))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_guidance_rescale_changes_output(sched):
    tables = DDIMTables.from_schedule(sched, 3)

    def model_fn(x, t, branches):
        # cond branch proportional to x, uncond a constant — different stds
        # so the std-renormalization actually changes the CFG output
        b = x.shape[0] // branches
        out = 0.3 * x
        return out.at[b:].set(0.05)

    shape = (1, 2, 4, 4, 3)
    a = ddim_sample(model_fn, shape, tables, jax.random.PRNGKey(0), cfg_scale=3.0)
    b = ddim_sample(
        model_fn, shape, tables, jax.random.PRNGKey(0), cfg_scale=3.0,
        guidance_rescale=0.7,
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dynamic_rescale_applied():
    sched_dr = DiffusionSchedule.create(use_dynamic_rescale=True)
    sched_no = DiffusionSchedule.create(use_dynamic_rescale=False)

    def model_fn(x, t, branches):
        return 0.3 * x

    shape = (1, 2, 4, 4, 3)
    t1 = DDIMTables.from_schedule(sched_dr, 5)
    t2 = DDIMTables.from_schedule(sched_no, 5)
    a = ddim_sample(model_fn, shape, t1, jax.random.PRNGKey(0))
    b = ddim_sample(model_fn, shape, t2, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a), np.asarray(b))
