"""geo4d_tpu — a TPU-native 4D video-diffusion reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Geo4D
(video-diffusion-based monocular 4D reconstruction): an RGB-conditioned
latent video diffusion model that denoises geometry modalities (point maps
+ confidence, Plücker ray/cross maps, inverse depth), a sliding-window
scheduler, and a group global-alignment optimizer that fuses overlapping
window predictions into a consistent 4D scene + camera trajectory.

Layering (bottom-up):
  core/       config, schedules, dtype policy, PRNG discipline
  ops/        Pallas TPU kernels (flash attention)
  nn/         Flax modules: attention, UNet blocks, VAE blocks, CLIP, resampler
  models/     UNet3D, AutoencoderKL (+conf adaptor), diffusion model, converters
  sampling/   DDIM (lax.scan), CFG variants
  geometry/   Plücker rays<->cameras, MoGe focal/shift recovery, Umeyama, PnP
  alignment/  group global-alignment optimizer (optax, jitted)
  evals/      depth metrics, trajectory ATE/RPE, dataset registry
  data/       video decode, image loading
  parallel/   device mesh, shardings (windows/CFG/data parallel)
  pipeline/   end-to-end inference: windows -> diffusion -> alignment -> export
  training/   losses, train step, EMA
  cli/        command-line entry points
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import geo4d_tpu` free of jax import cost)."""
    lazy = {
        "GeoDiffusion": ("geo4d_tpu.models.diffusion", "GeoDiffusion"),
        "UNet3D": ("geo4d_tpu.models.unet3d", "UNet3D"),
        "AutoencoderKL": ("geo4d_tpu.models.autoencoder", "AutoencoderKL"),
        "DiffusionSchedule": ("geo4d_tpu.core.schedules", "DiffusionSchedule"),
        "GroupAligner": ("geo4d_tpu.alignment.optimizer", "GroupAligner"),
        "AlignerConfig": ("geo4d_tpu.alignment.optimizer", "AlignerConfig"),
        "InferenceConfig": ("geo4d_tpu.pipeline.inference", "InferenceConfig"),
        "reconstruct": ("geo4d_tpu.pipeline.inference", "reconstruct"),
        "build_from_yaml": ("geo4d_tpu.core.registry", "build_from_yaml"),
        "flagship": ("geo4d_tpu.models.presets", "flagship"),
        "tiny": ("geo4d_tpu.models.presets", "tiny"),
        "init_params": ("geo4d_tpu.models.presets", "init_params"),
        "WindowPredictor": ("geo4d_tpu.pipeline.inference", "WindowPredictor"),
        "save_results_dir": ("geo4d_tpu.pipeline.export", "save_results_dir"),
        "DataModule": ("geo4d_tpu.data.loader", "DataModule"),
        "ViewerServer": ("geo4d_tpu.viz.server", "ViewerServer"),
        "init_from_group": ("geo4d_tpu.alignment.init", "init_from_group"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'geo4d_tpu' has no attribute {name!r}")
