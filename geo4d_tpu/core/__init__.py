from geo4d_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    rescale_zero_terminal_snr,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_dynamic_rescale_array,
)
from geo4d_tpu.core.config import Registry, instantiate, load_config
