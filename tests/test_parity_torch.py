"""Activation parity against the reference torch modules (CPU, f32).

Retires SURVEY.md §7 hard part 1 ("silent transpose/key errors only show up
as bad geometry"): each reference module is instantiated from
/root/reference at a reduced width but FULL topology (identical block
structure/depth/wiring to the shipped configs/inference_geo4d.yaml), its
state dict is randomized (zero-init tails included, so information flows
through every branch), converted with the production
`models/convert.py::convert_state_dict` rules, and the f32 forward
activations are diffed.

Covered: UNet3D (1D + 2D timesteps, fps cond, image cross-attention,
init_attn) vs lvdm/modules/networks/openaimodel3d.py:281; VAE encode /
decode / conf-head decode (give_pre_and_end branch) vs ae_modules.py:448,583
+ autoencoder_adaptor.py:92,203 + the AutoencoderKL composition
(autoencoder.py:104-127); Resampler vs resampler.py:96; standalone
Spatial/TemporalTransformer blocks for failure localization.

Every conversion also asserts that NO torch key goes unused and NO flax
leaf goes unfilled — the key-map is exact in both directions.
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
    _LEAF,
    _transformer_field,
    convert_state_dict,
    resampler_torch_key,
    unet_torch_key,
    vae_torch_key,
)

CPU = jax.devices("cpu")[0]
TOL = 1e-4        # single blocks / single towers
TOL_FULL = 5e-4   # full UNet: f32 reduction-order noise accumulates over
                  # ~40 blocks (measured 2.6e-4 at unit-scale activations);
                  # a transpose/key error produces O(1) diffs, not 1e-4s


def randomize_sd(module, seed, scale=0.05):
    """torch default init, but fill every all-zero tensor (zero_module
    tails, norm biases, fps_embedding tail) with noise so a key-map error
    anywhere shows up in the output diff."""
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in module.state_dict().items():
        if v.is_floating_point() and bool((v == 0).all()):
            out[k] = torch.randn(v.shape, generator=g) * scale
        else:
            out[k] = v.clone()
    return out


def convert_checked(sd, template, key_fn):
    np_sd = {k: v.detach().numpy() for k, v in sd.items()}
    params, missing, used = convert_state_dict(np_sd, template, key_fn)
    assert not missing, f"unfilled flax leaves: {missing[:10]}"
    unused = sorted(set(np_sd) - set(used))
    assert not unused, f"unused torch keys: {unused[:10]}"
    return params


def max_abs_diff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# ---------------------------------------------------------------- UNet ----

UNET_T = 4
UNET_KW = dict(  # shipped config topology (inference_geo4d.yaml:62-93) at width 32
    model_channels=32,
    num_res_blocks=2,
    attention_resolutions=[4, 2, 1],
    channel_mult=[1, 2, 4, 4],
    num_head_channels=8,
    transformer_depth=1,
    context_dim=64,
    temporal_length=UNET_T,
    addition_attention=True,
    image_cross_attention=True,
    default_fs=24,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def unet_pair():
    ref = lvdm_unet.UNetModel(
        in_channels=20,
        out_channels=16,
        use_linear=True,
        use_checkpoint=False,
        temporal_conv=True,
        temporal_attention=True,
        temporal_selfatt_only=True,
        use_relative_position=False,
        use_causal_attention=False,
        fs_condition=True,
        **UNET_KW,
    )
    sd = randomize_sd(ref, 0)
    ref.load_state_dict(sd)
    ref.eval()

    from geo4d_tpu.models.unet3d import UNet3D

    unet = UNet3D(dtype=jnp.float32, **UNET_KW)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: unet.init(
                k,
                jnp.zeros((1, UNET_T, 16, 16, 20)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77 + UNET_T * 16, 64)),
                jnp.zeros((1,), jnp.int32),
            ),
            jax.random.PRNGKey(0),
        )
        params = convert_checked(sd, template, unet_torch_key)
    return ref, unet, params


def _unet_inputs(b=2):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(b, UNET_T, 16, 16, 20)).astype(np.float32)
    ctx = rng.normal(size=(b, 77 + UNET_T * 16, 64)).astype(np.float32)
    fs = np.array([24, 10][:b], np.int64)
    return x, ctx, fs


def _ref_unet(ref, x, ts, ctx, fs):
    with torch.no_grad():
        out = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3))),
            torch.from_numpy(ts),
            context=torch.from_numpy(ctx),
            fs=torch.from_numpy(fs),
        )
    return out.numpy().transpose(0, 2, 3, 4, 1)


def test_unet_forward_parity(unet_pair):
    ref, unet, params = unet_pair
    x, ctx, fs = _unet_inputs()
    ts = np.array([500, 123], np.int64)
    ref_out = _ref_unet(ref, x, ts, ctx, fs)
    with jax.default_device(CPU):
        out = jax.jit(unet.apply)(
            params, x, ts.astype(np.int32), ctx, fs.astype(np.int32)
        )
    assert np.abs(ref_out).max() > 1e-3  # non-degenerate
    assert max_abs_diff(out, ref_out) < TOL_FULL


def test_unet_2d_timestep_parity(unet_pair):
    """Per-frame 2D timesteps (openaimodel3d.py:560-568) — the
    geometry-condition training path."""
    ref, unet, params = unet_pair
    x, ctx, fs = _unet_inputs()
    ts2d = np.array(
        [[0, 400, 800, 999], [999, 999, 0, 0]], np.int64
    )
    ref_out = _ref_unet(ref, x, ts2d, ctx, fs)
    with jax.default_device(CPU):
        out = jax.jit(unet.apply)(
            params, x, ts2d.astype(np.int32), ctx, fs.astype(np.int32)
        )
    assert max_abs_diff(out, ref_out) < TOL_FULL


# ----------------------------------------------------------------- VAE ----

VAE_DD = dict(  # shipped ddconfig (yaml:7-23) at ch 32
    double_z=True,
    z_channels=4,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2, 4, 4],
    num_res_blocks=2,
    attn_resolutions=[],
    dropout=0.0,
)
VAE_AD = dict(  # shipped adaptorconfig (yaml:26-37) at ch 32
    double_z=True,
    z_channels=4,
    resolution=32,
    in_channels=3,
    out_ch=1,
    ch=32,
    ch_mult=[1],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)


class _RefVAE(torch.nn.Module):
    """The AutoencoderKL composition (lvdm/models/autoencoder.py:14-127)
    rebuilt from its raw modules — pytorch_lightning (its base class) is
    not installed here, and only the module wiring matters for parity."""

    def __init__(self):
        super().__init__()
        self.encoder = lvdm_ae.Encoder(**VAE_DD)
        self.decoder = lvdm_ae.Decoder(**VAE_DD)
        self.quant_conv = torch.nn.Conv2d(2 * VAE_DD["z_channels"], 2 * 4, 1)
        self.post_quant_conv = torch.nn.Conv2d(4, VAE_DD["z_channels"], 1)
        self.encoder_adaptor = lvdm_adaptor.VAEEncoderadaptor(**VAE_AD)
        self.decoder_adaptor = lvdm_adaptor.VAEDecoderadaptor(**VAE_AD)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def decode_with_conf(self, z):
        # autoencoder.py:120-127 (decode_with_conf_adaptor)
        z = self.post_quant_conv(z)
        self.decoder.give_pre_and_end = True
        rgb, pre = self.decoder(z)
        self.decoder.give_pre_and_end = False
        conf = self.decoder_adaptor(pre)
        return torch.cat([rgb, conf], dim=1)


@pytest.fixture(scope="module")
def vae_pair():
    ref = _RefVAE()
    sd = randomize_sd(ref, 1)
    ref.load_state_dict(sd)
    ref.eval()

    from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig

    cfg = VAEConfig(ch=32, adaptor_ch=32)
    vae = AutoencoderKL(cfg=cfg, dtype=jnp.float32)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: vae.init(
                k, jnp.zeros((1, 32, 32, 3)), method=vae.init_all
            ),
            jax.random.PRNGKey(0),
        )
        params = convert_checked(sd, template, vae_torch_key)
    return ref, vae, params


def test_vae_encode_parity(vae_pair):
    ref, vae, params = vae_pair
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        moments = ref.encode_moments(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy()
    ref_mean, ref_logvar = moments[:, :4], np.clip(moments[:, 4:], -30, 20)
    with jax.default_device(CPU):
        mean, logvar = jax.jit(
            lambda p, x: vae.apply(p, x, method=vae.encode)
        )(params, x)
    assert max_abs_diff(mean, ref_mean.transpose(0, 2, 3, 1)) < TOL
    assert max_abs_diff(logvar, ref_logvar.transpose(0, 2, 3, 1)) < TOL


def test_vae_encode_with_adaptor_parity(vae_pair):
    ref, vae, params = vae_pair
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        moments = ref.encode_moments(ref.encoder_adaptor(xt)).numpy()
    with jax.default_device(CPU):
        mean, _ = jax.jit(
            lambda p, x: vae.apply(p, x, method=vae.encode_with_adaptor)
        )(params, x)
    assert max_abs_diff(mean, moments[:, :4].transpose(0, 2, 3, 1)) < TOL


def test_vae_decode_conf_parity(vae_pair):
    """The give_pre_and_end tap + confidence head (SURVEY §7 hard part 3)."""
    ref, vae, params = vae_pair
    rng = np.random.default_rng(7)
    z = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        zt = torch.from_numpy(np.ascontiguousarray(z.transpose(0, 3, 1, 2)))
        ref_rgbc = ref.decode_with_conf(zt).numpy().transpose(0, 2, 3, 1)
    with jax.default_device(CPU):
        rgbc = jax.jit(
            lambda p, z: vae.apply(p, z, method=vae.decode_with_conf)
        )(params, z)
    assert rgbc.shape == ref_rgbc.shape == (2, 32, 32, 4)
    assert np.abs(ref_rgbc).max() > 1e-3
    assert max_abs_diff(rgbc, ref_rgbc) < TOL


# ------------------------------------------------------------ Resampler ----

RES_KW = dict(  # shipped config (yaml:144-155) at dim 64
    dim=64,
    depth=4,
    dim_head=16,
    heads=4,
    num_queries=16,
    embedding_dim=96,
    output_dim=64,
    ff_mult=4,
    video_length=4,
)


def test_resampler_parity():
    ref = lvdm_resampler.Resampler(**RES_KW)
    sd = randomize_sd(ref, 2)
    ref.load_state_dict(sd)
    ref.eval()

    from geo4d_tpu.nn.resampler import Resampler

    res = Resampler(dtype=jnp.float32, **RES_KW)
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 4, 9, 96)).astype(np.float32)
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: res.init(k, jnp.zeros((1, 4, 9, 96))), jax.random.PRNGKey(0)
        )
        params = convert_checked(sd, template, resampler_torch_key)
        out = jax.jit(res.apply)(params, x)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    assert out.shape == ref_out.shape == (2, 4 * 16, 64)
    assert max_abs_diff(out, ref_out) < TOL


# ------------------------------------------- standalone attention blocks ----


def _block_key_fn(parts):
    parts = [
        p for p in parts if p not in ("params", "Conv_0", "Dense_0", "GroupNorm_0")
    ]
    field = _transformer_field(parts[:-1])
    if field is None and parts[0] == "norm":
        field = "norm"
    return f"{field}.{_LEAF[parts[-1]]}" if field else None


def test_spatial_transformer_parity():
    """Image cross-attention split at 77 tokens (attention.py:89-94,129-142)."""
    ref = lvdm_unet.SpatialTransformer(
        32, 4, 8, depth=1, context_dim=64, use_linear=True,
        use_checkpoint=False, disable_self_attn=False,
        image_cross_attention=True,
    )
    sd = randomize_sd(ref, 3)
    ref.load_state_dict(sd)
    ref.eval()

    from geo4d_tpu.nn.attention import SpatialTransformer

    st = SpatialTransformer(
        heads=4, dim_head=8, depth=1, context_dim=64,
        image_cross_attention=True, dtype=jnp.float32,
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    ctx = rng.normal(size=(2, 77 + 16, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = (
            ref(
                torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                context=torch.from_numpy(ctx),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: st.init(k, jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 93, 64))),
            jax.random.PRNGKey(0),
        )
        params = convert_checked(sd, template, _block_key_fn)
        out = jax.jit(lambda p, x, c: st.apply(p, x, c))(params, x, ctx)
    assert max_abs_diff(out, ref_out) < TOL


def test_temporal_transformer_parity():
    """Temporal tokens = T per pixel, Linear projections (attention.py:313)."""
    ref = lvdm_unet.TemporalTransformer(
        32, 4, 8, depth=1, context_dim=None, use_linear=True,
        use_checkpoint=False, only_self_att=True, causal_attention=False,
        relative_position=False, temporal_length=4,
    )
    sd = randomize_sd(ref, 4)
    ref.load_state_dict(sd)
    ref.eval()

    from geo4d_tpu.nn.attention import TemporalTransformer

    tt = TemporalTransformer(
        heads=4, dim_head=8, depth=1, temporal_length=4, dtype=jnp.float32
    )
    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, 4, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        # torch layout (b, c, t, h, w)
        ref_out = (
            ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3))))
            .numpy()
            .transpose(0, 2, 3, 4, 1)
        )
    with jax.default_device(CPU):
        template = jax.eval_shape(
            lambda k: tt.init(k, jnp.zeros((1, 4, 8, 8, 32))), jax.random.PRNGKey(0)
        )
        params = convert_checked(sd, template, _block_key_fn)
        out = jax.jit(tt.apply)(params, x)
    assert max_abs_diff(out, ref_out) < TOL
