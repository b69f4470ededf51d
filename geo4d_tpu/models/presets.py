"""Model presets: shipped (flagship) and tiny (tests/smoke) configurations."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from geo4d_tpu.core.schedules import DiffusionSchedule
from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig
from geo4d_tpu.models.diffusion import GeoDiffusion
from geo4d_tpu.models.unet3d import UNet3D
from geo4d_tpu.nn.clip import CLIPTextEncoder, CLIPVisionEncoder
from geo4d_tpu.nn.resampler import Resampler


def flagship() -> GeoDiffusion:
    """The shipped Geo4D configuration (configs/inference_geo4d.yaml)."""
    return GeoDiffusion()


def tiny(temporal_length: int = 4, dtype=jnp.float32) -> GeoDiffusion:
    """A miniature but structurally-complete model for tests: every tower
    present, channel counts shrunk ~100x."""
    ctx_dim = 64
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                        adaptor_ch=16)
    return GeoDiffusion(
        unet=UNet3D(
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=(1, 2),
            channel_mult=(1, 2),
            num_head_channels=16,
            context_dim=ctx_dim,
            temporal_length=temporal_length,
            dropout=0.0,
            dtype=dtype,
        ),
        vae=AutoencoderKL(cfg=vae_cfg, with_adaptor=False, dtype=dtype),
        pointmap_vae=AutoencoderKL(cfg=vae_cfg, with_adaptor=True, dtype=dtype),
        text_encoder=CLIPTextEncoder(
            vocab_size=128, width=ctx_dim, heads=4, layers=2,
            context_length=77, dtype=dtype,
        ),
        image_encoder=CLIPVisionEncoder(
            width=48, heads=4, layers=2, patch_size=14, dtype=dtype
        ),
        resampler=Resampler(
            dim=ctx_dim, depth=1, dim_head=16, heads=4, num_queries=16,
            embedding_dim=48, output_dim=ctx_dim,
            video_length=temporal_length, dtype=dtype,
        ),
    )


def init_params(
    model: GeoDiffusion,
    key: jax.Array,
    image_size: Tuple[int, int],     # (H, W) pixel space, /8 for latents
    temporal_length: int = 16,
    with_text: bool = True,
) -> Dict[str, Any]:
    """Initialize every tower's params (random weights)."""
    h, w = image_size
    t = temporal_length
    keys = jax.random.split(key, 6)
    ctx_dim = model.unet.context_dim
    # all inits jitted: eager init dispatches thousands of individual ops
    # (minutes on a slow host); one traced graph per tower is seconds
    p: Dict[str, Any] = {}
    p["unet"] = jax.jit(
        lambda k: model.unet.init(
            k,
            jnp.zeros((1, t, h // 8, w // 8, model.unet.in_channels), jnp.float32),
            jnp.array([0]),
            jnp.zeros((1, 77 + t * 16, ctx_dim), jnp.float32),
            jnp.array([24]),
        )
    )(keys[0])
    p["vae"] = jax.jit(lambda k: model.vae.init(k, jnp.zeros((1, h, w, 3))))(keys[1])
    if model.pointmap_vae is not None:
        p["pointmap_vae"] = jax.jit(
            lambda k: model.pointmap_vae.init(
                k, jnp.zeros((1, h, w, 3)), method=model.pointmap_vae.init_all
            )
        )(keys[2])
    p["clip_img"] = jax.jit(
        lambda k: model.image_encoder.init(k, jnp.zeros((1, 224, 224, 3)))
    )(keys[3])
    p["resampler"] = jax.jit(
        lambda k: model.resampler.init(
            k, jnp.zeros((1, t, 257, model.resampler.embedding_dim))
        )
    )(keys[4])
    if with_text:
        p["clip_text"] = jax.jit(
            lambda k: model.text_encoder.init(
                k, jnp.zeros((1, model.text_encoder.context_length), jnp.int32)
            )
        )(keys[5])
    return p
