"""SD-style f=8 KL autoencoder + fine-tuned geometry adaptors.

Parity targets: reference lvdm/modules/networks/ae_modules.py (Encoder :448,
Decoder :583, ResnetBlock :189, AttnBlock :26) and
lvdm/models/autoencoder.py (AutoencoderKL :14, adaptor hooks :104-127),
lvdm/models/autoencoder_adaptor.py (VAEEncoderadaptor :92 — residual
zero-init refiner at full res; VAEDecoderadaptor :203 — maps the decoder's
128-ch pre-head features to a 1-ch confidence map).

TPU-first: channels-last, bf16 convs, f32 GroupNorm(eps 1e-6), the decoder
runs all frames as one batch (the reference's --perframe_ae memory loop is
unnecessary under XLA's arena allocator; batching keeps the MXU fed).
The conf-decode path (`decode_with_conf`) runs the decoder ONCE and taps the
pre-head feature map for the confidence adaptor — matching the reference's
give_pre_and_end branch (ae_modules.py:691-704).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo4d_tpu.nn.basics import Conv, GroupNorm32


def swish(x):
    return x * jax.nn.sigmoid(x)


class VAEResnetBlock(nn.Module):
    """norm-swish-conv x2 with 1x1 shortcut (ae_modules.py:189-248)."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm1")(x)
        h = Conv(c_out, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm2")(h)
        h = Conv(c_out, 3, dtype=self.dtype, name="conv2")(h)
        if c_in != c_out:
            x = Conv(c_out, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over h*w tokens (ae_modules.py:26-77)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, c = x.shape
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = Conv(c, 1, dtype=self.dtype, name="q")(h).reshape(b, hgt * wid, c)
        k = Conv(c, 1, dtype=self.dtype, name="k")(h).reshape(b, hgt * wid, c)
        v = Conv(c, 1, dtype=self.dtype, name="v")(h).reshape(b, hgt * wid, c)
        logits = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits * (c**-0.5), axis=-1)
        out = jnp.einsum("bij,bjc->bic", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, hgt, wid, c)
        return x + Conv(c, 1, dtype=self.dtype, name="proj_out")(out)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Shipped SD-VAE shape (configs/inference_geo4d.yaml:7-23)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_ch: int = 3
    double_z: bool = True
    # adaptor (yaml:26-37): full-res, ch 128, 1 res block, out 1 (confidence)
    adaptor_ch: int = 128
    adaptor_num_res_blocks: int = 1
    adaptor_out_ch: int = 1


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = Conv(cfg.ch, 3, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = VAEResnetBlock(
                    cfg.ch * mult, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != len(cfg.ch_mult) - 1:
                # conv downsample with the reference's asymmetric (0,1) pad
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"down_{i_level}_downsample",
                )(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm_out")(h)
        zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv(zc, 3, dtype=self.dtype, name="conv_out")(h)


class VAEDecoder(nn.Module):
    """Returns (rgb, pre_head_features) — the pre-head tap feeds the
    confidence adaptor (ae_modules.py give_pre_and_end :700-701)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = Conv(block_in, 3, dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(len(cfg.ch_mult))):
            for i_block in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(
                    cfg.ch * cfg.ch_mult[i_level], dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
            if i_level != 0:
                b, hh, ww, c = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (b, hh, 2, ww, 2, c)
                ).reshape(b, 2 * hh, 2 * ww, c)
                h = Conv(c, 3, dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        pre_head = h
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm_out")(h)
        rgb = Conv(cfg.out_ch, 3, dtype=self.dtype, name="conv_out")(h)
        return rgb, pre_head


class EncoderAdaptor(nn.Module):
    """Full-res residual refiner, zero-init tail (autoencoder_adaptor.py:92-199)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = Conv(cfg.adaptor_ch, 3, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i in range(cfg.adaptor_num_res_blocks):
            h = VAEResnetBlock(cfg.adaptor_ch, dtype=self.dtype, name=f"block_{i}")(h)
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm_out")(h)
        h = Conv(cfg.in_channels, 3, zero_init=True, dtype=self.dtype, name="conv_out")(h)
        return h + x.astype(h.dtype)


class DecoderAdaptor(nn.Module):
    """Pre-head features (128ch) -> confidence map (autoencoder_adaptor.py:203-317)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pre_head):
        cfg = self.cfg
        h = pre_head
        for i in range(cfg.adaptor_num_res_blocks + 1):
            h = VAEResnetBlock(cfg.adaptor_ch, dtype=self.dtype, name=f"block_{i}")(h)
        h = GroupNorm32(epsilon=1e-6, silu=True, name="norm_out")(h)
        return Conv(cfg.adaptor_out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder with quant convs and geometry adaptors.

    Methods mirror the reference surface (lvdm/models/autoencoder.py):
      encode(x)            -> (mean, logvar) of the diagonal posterior
      decode(z)            -> rgb
      encode_with_adaptor  -> refine input, then encode
      decode_with_conf     -> [rgb | confidence] (4ch), single decoder pass
    """

    cfg: VAEConfig = VAEConfig()
    with_adaptor: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, dtype=self.dtype)
        self.decoder = VAEDecoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.cfg.embed_dim, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.z_channels, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="post_quant_conv",
        )
        if self.with_adaptor:
            self.encoder_adaptor = EncoderAdaptor(self.cfg, dtype=self.dtype)
            self.decoder_adaptor = DecoderAdaptor(self.cfg, dtype=self.dtype)

    def encode(self, x) -> Tuple[jax.Array, jax.Array]:
        moments = self.quant_conv(self.encoder(x)).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_with_adaptor(self, x):
        return self.encode(self.encoder_adaptor(x))

    def decode(self, z) -> jax.Array:
        rgb, _ = self.decoder(self.post_quant_conv(z))
        return rgb.astype(jnp.float32)

    def decode_with_conf(self, z) -> jax.Array:
        rgb, pre_head = self.decoder(self.post_quant_conv(z))
        conf = self.decoder_adaptor(pre_head)
        return jnp.concatenate([rgb, conf], axis=-1).astype(jnp.float32)

    def init_all(self, x):
        """Touches every submodule so `init` creates all params (adaptors
        included) — linen only materializes what gets traced."""
        mean, logvar = self.encode_with_adaptor(x)
        return self.decode_with_conf(mean)

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar
