"""Full-width checkpoint key-map audit (VERDICT r2 item 5).

tests/test_parity_torch.py proves the converter numerically at reduced
width; this file pins the EXACT key set at the shipped width
(configs/inference_geo4d.yaml:38-156): the reference UNet / VAE(+adaptors) /
Resampler are instantiated on torch's meta device (no weight memory), their
state-dict keys enumerated, and a bijection with the full-width flax
template (jax.eval_shape — trace only, no arrays) is asserted through
models/convert.py's key rules. A width-dependent naming branch anywhere
(e.g. an attention head split that only appears at 320 channels) breaks
this even though the reduced-width parity tests still pass.

Shape audit: forward_transform only permutes axes, so each mapped pair must
agree in element count and dim multiset.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

lvdm_unet = pytest.importorskip("lvdm.modules.networks.openaimodel3d")
lvdm_ae = pytest.importorskip("lvdm.modules.networks.ae_modules")
lvdm_adaptor = pytest.importorskip("lvdm.models.autoencoder_adaptor")
lvdm_resampler = pytest.importorskip("lvdm.modules.encoders.resampler")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geo4d_tpu.models.convert import (  # noqa: E402
    resampler_torch_key,
    unet_torch_key,
    vae_torch_key,
)

CPU = jax.devices("cpu")[0]

# shipped widths, verbatim from the reference YAML
UNET_FULL = dict(
    in_channels=20,
    out_channels=16,
    model_channels=320,
    attention_resolutions=(4, 2, 1),
    num_res_blocks=2,
    channel_mult=(1, 2, 4, 4),
    num_head_channels=64,
    transformer_depth=1,
    context_dim=1024,
    temporal_length=16,
    addition_attention=True,
    image_cross_attention=True,
    default_fs=24,
    fs_condition=True,
    dropout=0.1,
)
VAE_FULL = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3,
    out_ch=3, ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
    attn_resolutions=(), dropout=0.0,
)
VAE_AD_FULL = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3,
    out_ch=1, ch=128, ch_mult=(1,), num_res_blocks=1,
    attn_resolutions=(), dropout=0.0,
)
RES_FULL = dict(
    dim=1024, depth=4, dim_head=64, heads=12, num_queries=16,
    embedding_dim=1280, output_dim=1024, ff_mult=4, video_length=16,
)


def flax_leaf_keys(template, key_fn):
    """{mapped torch key: flax leaf shape} over a template tree; asserts
    every leaf has a rule."""
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    out = {}
    for path, leaf in flat:
        parts = [str(k.key) for k in path]
        tkey = key_fn(parts)
        assert tkey is not None, f"no key rule for {'/'.join(parts)}"
        assert tkey not in out, f"duplicate torch key {tkey}"
        out[tkey] = tuple(leaf.shape)
    return out


def audit(torch_sd_shapes, flax_map):
    """Bijection + per-key size/dim-multiset agreement."""
    t_keys, f_keys = set(torch_sd_shapes), set(flax_map)
    assert t_keys == f_keys, (
        f"unmapped torch keys: {sorted(t_keys - f_keys)[:8]}; "
        f"phantom flax rules: {sorted(f_keys - t_keys)[:8]}"
    )
    for k in t_keys:
        ts, fs = tuple(torch_sd_shapes[k]), flax_map[k]
        assert int(np.prod(ts)) == int(np.prod(fs)), f"{k}: {ts} vs {fs}"
        # transforms only permute axes (+/- squeezed length-1 conv dims)
        nontrivial = lambda s: sorted(d for d in s if d != 1)  # noqa: E731
        assert nontrivial(ts) == nontrivial(fs), f"{k}: {ts} vs {fs}"


def meta_state_shapes(module):
    return {k: tuple(v.shape) for k, v in module.state_dict().items()}


def test_unet_fullwidth_key_bijection():
    with torch.device("meta"):
        ref = lvdm_unet.UNetModel(
            use_linear=True,
            use_checkpoint=False,
            temporal_conv=True,
            temporal_attention=True,
            temporal_selfatt_only=True,
            use_relative_position=False,
            use_causal_attention=False,
            **UNET_FULL,
        )
    sd_shapes = meta_state_shapes(ref)

    from geo4d_tpu.models.unet3d import UNet3D

    unet = UNet3D(dtype=jnp.float32, **UNET_FULL)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: unet.init(
                k,
                jnp.zeros((1, 16, 32, 64, 20)),  # shipped latent size
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77 + 16 * 16, 1024)),
                jnp.zeros((1,), jnp.int32),
            ),
            jax.random.PRNGKey(0),
        )
    audit(sd_shapes, flax_leaf_keys(template, unet_torch_key))


def test_vae_fullwidth_key_bijection():
    with torch.device("meta"):
        enc = lvdm_ae.Encoder(**VAE_FULL)
        dec = lvdm_ae.Decoder(**VAE_FULL)
        qc = torch.nn.Conv2d(2 * 4, 2 * 4, 1)
        pqc = torch.nn.Conv2d(4, 4, 1)
        enc_ad = lvdm_adaptor.VAEEncoderadaptor(**VAE_AD_FULL)
        dec_ad = lvdm_adaptor.VAEDecoderadaptor(**VAE_AD_FULL)
    sd_shapes = {}
    for prefix, m in (
        ("encoder", enc), ("decoder", dec), ("quant_conv", qc),
        ("post_quant_conv", pqc), ("encoder_adaptor", enc_ad),
        ("decoder_adaptor", dec_ad),
    ):
        sd_shapes.update(
            {f"{prefix}.{k}": v for k, v in meta_state_shapes(m).items()}
        )

    from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig

    cfg = VAEConfig(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                    adaptor_ch=128)
    vae = AutoencoderKL(cfg=cfg, dtype=jnp.float32)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: vae.init(
                k, jnp.zeros((1, 32, 32, 3)), method=vae.init_all
            ),
            jax.random.PRNGKey(0),
        )
    audit(sd_shapes, flax_leaf_keys(template, vae_torch_key))


def test_resampler_fullwidth_key_bijection():
    with torch.device("meta"):
        ref = lvdm_resampler.Resampler(**RES_FULL)
    sd_shapes = meta_state_shapes(ref)

    from geo4d_tpu.nn.resampler import Resampler

    res = Resampler(dtype=jnp.float32, **RES_FULL)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: res.init(k, jnp.zeros((1, 16, 257, 1280))),
            jax.random.PRNGKey(0),
        )
    audit(sd_shapes, flax_leaf_keys(template, resampler_torch_key))
