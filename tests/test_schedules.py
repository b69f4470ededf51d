"""Schedule math parity with the reference formulas
(lvdm/models/utils_diffusion.py, ddpm3d.py register_schedule)."""

import numpy as np
import pytest

from geo4d_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_dynamic_rescale_array,
    rescale_zero_terminal_snr,
)

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def test_linear_beta_schedule_endpoints():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(0.00085)
    assert betas[-1] == pytest.approx(0.012)
    # sqrt-space linearity
    s = np.sqrt(betas)
    diffs = np.diff(s)
    assert np.allclose(diffs, diffs[0])


def test_zero_terminal_snr():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    rescaled = rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1.0 - rescaled)
    # terminal SNR is exactly zero: abar[-1] == 0
    assert abs(abar[-1]) < 1e-12
    # first-step abar unchanged
    abar0 = np.cumprod(1.0 - betas)[0]
    assert abar[0] == pytest.approx(abar0, rel=1e-10)


def test_uniform_trailing_timesteps():
    # 5 steps over 1000: reference picks flip(round(arange(1000,0,-200)))-1
    ts = make_ddim_timesteps("uniform_trailing", 5, 1000)
    assert ts.tolist() == [199, 399, 599, 799, 999]
    # last step is T-1 (the whole point of trailing spacing)
    assert ts[-1] == 999


def test_uniform_timesteps():
    ts = make_ddim_timesteps("uniform", 5, 1000)
    assert ts.tolist() == [1, 201, 401, 601, 801]


def test_ddim_sampling_parameters_eta0():
    sched = DiffusionSchedule.create()
    ts = make_ddim_timesteps("uniform_trailing", 5, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        np.asarray(sched.alphas_cumprod, np.float64), ts, eta=0.0
    )
    assert np.all(sigmas == 0)
    assert np.allclose(alphas, np.asarray(sched.alphas_cumprod)[ts], rtol=1e-6)
    assert alphas_prev[0] == pytest.approx(sched.alphas_cumprod[0], rel=1e-6)
    assert np.allclose(alphas_prev[1:], alphas[:-1])


def test_dynamic_rescale_array():
    arr = make_dynamic_rescale_array(1000, base_scale=0.7, turning_step=400)
    assert arr[0] == pytest.approx(1.0)
    assert arr[399] == pytest.approx(0.7)
    assert np.all(arr[400:1000] == pytest.approx(0.7))


def test_schedule_create_shapes_and_monotonicity():
    sched = DiffusionSchedule.create()
    assert sched.num_timesteps == 1000
    assert sched.alphas_cumprod.shape == (1000,)
    assert np.all(np.diff(sched.alphas_cumprod) < 0)  # strictly decreasing
    # zero-SNR: last abar == 0 (within f32)
    assert sched.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-7)
    tables = sched.ddim_step_tables(5, "uniform_trailing", eta=0.0)
    assert tables["timesteps"].tolist() == [199, 399, 599, 799, 999]
    assert tables["scale"].shape == (5,)
    assert tables["scale_prev"][0] == tables["scale"][0]
