"""Component registry entries + reference-YAML compatibility layer.

The reference instantiates its object tree reflectively from
configs/inference_geo4d.yaml via dotted import paths
(utils/utils.py:27-42). Here those same `target:` strings resolve through
an explicit allow-list registry to our constructors, so a user can point
geo4d_tpu at an unmodified reference YAML and get the equivalent
TPU-native model bundle.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from geo4d_tpu.core.config import components, instantiate, load_config


def _register_all():
    if "geo4d_tpu.UNet3D" in components:
        return

    @components.register(
        "geo4d_tpu.UNet3D", "lvdm.modules.networks.openaimodel3d.UNetModel"
    )
    def _unet(**p):
        import jax.numpy as jnp

        from geo4d_tpu.models.unet3d import UNet3D

        return UNet3D(
            in_channels=p.get("in_channels", 20),
            out_channels=p.get("out_channels", 16),
            model_channels=p.get("model_channels", 320),
            num_res_blocks=p.get("num_res_blocks", 2),
            attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
            channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
            num_head_channels=p.get("num_head_channels", 64),
            transformer_depth=p.get("transformer_depth", 1),
            context_dim=p.get("context_dim", 1024),
            temporal_length=p.get("temporal_length", 16),
            temporal_conv=p.get("temporal_conv", True),
            temporal_attention=p.get("temporal_attention", True),
            use_relative_position=p.get("use_relative_position", False),
            use_causal_attention=p.get("use_causal_attention", False),
            addition_attention=p.get("addition_attention", True),
            image_cross_attention=p.get("image_cross_attention", True),
            fs_condition=p.get("fs_condition", False),
            default_fs=p.get("default_fs", 4),
            dropout=p.get("dropout", 0.0),
        )

    @components.register(
        "geo4d_tpu.AutoencoderKL", "lvdm.models.autoencoder.AutoencoderKL"
    )
    def _vae(**p):
        from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig

        dd = p.get("ddconfig", {})
        ad = p.get("adaptorconfig") or {}
        cfg = VAEConfig(
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            embed_dim=p.get("embed_dim", 4),
            in_channels=dd.get("in_channels", 3),
            out_ch=dd.get("out_ch", 3),
            double_z=dd.get("double_z", True),
            adaptor_ch=ad.get("ch", 128),
            adaptor_num_res_blocks=ad.get("num_res_blocks", 1),
            adaptor_out_ch=ad.get("out_ch", 1),
        )
        return AutoencoderKL(cfg=cfg, with_adaptor=bool(ad))

    @components.register(
        "geo4d_tpu.CLIPTextEncoder",
        "lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder",
    )
    def _text(**p):
        from geo4d_tpu.nn.clip import CLIPTextEncoder

        return CLIPTextEncoder(penultimate=p.get("layer", "penultimate") == "penultimate")

    @components.register(
        "geo4d_tpu.CLIPVisionEncoder",
        "lvdm.modules.encoders.condition.FrozenOpenCLIPImageEmbedderV2",
    )
    def _vision(**p):
        from geo4d_tpu.nn.clip import CLIPVisionEncoder

        return CLIPVisionEncoder()

    @components.register(
        "geo4d_tpu.Resampler", "lvdm.modules.encoders.resampler.Resampler"
    )
    def _resampler(**p):
        from geo4d_tpu.nn.resampler import Resampler

        return Resampler(
            dim=p.get("dim", 1024),
            depth=p.get("depth", 4),
            dim_head=p.get("dim_head", 64),
            heads=p.get("heads", 12),
            num_queries=p.get("num_queries", 16),
            embedding_dim=p.get("embedding_dim", 1280),
            output_dim=p.get("output_dim", 1024),
            ff_mult=p.get("ff_mult", 4),
            video_length=p.get("video_length", 16),
        )


def build_from_yaml(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Reference-layout YAML -> (GeoDiffusion bundle, postprocess dict).

    Accepts configs shaped like the reference's inference_geo4d.yaml: a
    `model.params` tree with unet/first-stage/cond-stage/image-proj configs,
    an optional top-level `pointmap_vae_config`, and a `postprocess` block.
    """
    _register_all()
    import dataclasses

    from geo4d_tpu.core.schedules import DiffusionSchedule
    from geo4d_tpu.models.diffusion import GeoDiffusion

    cfg = load_config(path)
    mp = cfg["model"]["params"]

    unet = instantiate(mp["unet_config"])
    vae = instantiate(mp["first_stage_config"])
    pointmap_vae = (
        instantiate(cfg["pointmap_vae_config"])
        if "pointmap_vae_config" in cfg
        else None
    )
    text = instantiate(mp["cond_stage_config"])
    vision = instantiate(mp["img_cond_stage_config"])
    resampler = instantiate(mp["image_proj_stage_config"])

    schedule = DiffusionSchedule.create(
        timesteps=mp.get("timesteps", 1000),
        linear_start=mp.get("linear_start", 0.00085),
        linear_end=mp.get("linear_end", 0.012),
        rescale_betas_zero_snr=mp.get("rescale_betas_zero_snr", True),
        parameterization=mp.get("parameterization", "v"),
        use_dynamic_rescale=mp.get("use_dynamic_rescale", True),
        base_scale=mp.get("base_scale", 0.7),
    )
    model = GeoDiffusion(
        unet=unet,
        vae=vae,
        pointmap_vae=pointmap_vae,
        text_encoder=text,
        image_encoder=vision,
        resampler=resampler,
        schedule=schedule,
        scale_factor=mp.get("scale_factor", 0.18215),
        modality=mp.get("modality", "pc_ray_cross_depth"),
    )
    return model, cfg.get("postprocess", {})
