"""END-TO-END pipeline cross-check against the GENUINE reference code.

This is the round-4 "proof" artifact (VERDICT.md next-round item 1): the
reference's own `LatentVisualDiffusion` + `DDIMSampler` + the
`image_guided_synthesis` -> sky/far masks -> softplus conf -> bbox2 denorm ->
Plücker-camera pipeline from /root/reference/scripts/evaluation/
test_geo4d.py:118-274,276-287,466-499 runs on CPU torch at reduced width but
FULL topology, and `WindowPredictor.predict_windows` runs on the SAME
converted weights, same frames, same injected initial noise. Any
pipeline-order divergence (mask-before-vs-after denorm, conf inversion,
CFG wiring, uniform_trailing off-by-one, latent slicing, scale-factor
placement, context concat order) produces O(1) diffs and fails these tests.

Oracle strength: the torch side is the reference's actual code imported from
/root/reference (with sys.modules stubs for packages absent here — see
tests/_refstubs.py). Only the CLIP towers are replaced, on BOTH sides, by
identical deterministic stand-ins (tests/xcheck_standins.py) — CLIP is a
frozen external encoder; everything downstream of its tokens is exercised.

RNG control: x_T is injected identically on both sides (the reference
sampler's own x_T kwarg, ddim.py:144-147); VAE posterior sampling is pinned
to the mode on both sides; eta=0 makes the rest of the chain deterministic.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _refstubs  # noqa: E402

_refstubs.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import xcheck_standins as standins  # noqa: E402

pytestmark = pytest.mark.slow

CPU = jax.devices("cpu")[0]

T = 8            # window length (reference uses 16; topology is length-agnostic)
N_FRAMES = 12    # total video frames -> windows [0:8], [4:12] at stride 4
H_PX, W_PX = 64, 128  # non-square like every eval preset (the reference
                      # cameras_from_plucker path requires H != W) and multiples
                      # of 64 (3 UNet downsamples on f/8 latents; the reference
                      # asserts this at test_geo4d.py:354-356); latent 8x16
CTX = standins.CTX_DIM
PROMPT = "Output a video that assigns each 3D location in the world a consistent color."

UNET_KW = dict(  # shipped topology (configs/inference_geo4d.yaml:62-93), width/16
    model_channels=32,
    num_res_blocks=2,
    attention_resolutions=[4, 2, 1],
    channel_mult=[1, 2, 4, 4],
    num_head_channels=8,
    transformer_depth=1,
    context_dim=CTX,
    temporal_length=T,
    addition_attention=True,
    image_cross_attention=True,
    default_fs=24,
    dropout=0.0,
)
VAE_DD = dict(  # shipped ddconfig (yaml:7-23) at ch 32 (GroupNorm32 floor)
    double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2, 2, 2], num_res_blocks=1, attn_resolutions=[],
    dropout=0.0,
)
VAE_AD = dict(  # shipped adaptorconfig (yaml:26-37) at ch 32
    double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=1,
    ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
)
RESAMPLER_KW = dict(
    dim=CTX, depth=1, dim_head=16, heads=4, num_queries=16,
    embedding_dim=standins.VIS_DIM, output_dim=CTX, video_length=T,
)


def _randomize_sd(module, seed, scale=0.05):
    """torch default init + noise into all-zero tensors (zero_module tails)
    so every branch carries signal — same scheme as tests/test_parity_torch."""
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in module.state_dict().items():
        if v.is_floating_point() and bool((v == 0).all()):
            out[k] = torch.randn(v.shape, generator=g) * scale
        else:
            out[k] = v.clone()
    return out


@pytest.fixture(scope="module")
def ref():
    """Import the genuine reference modules (stubs already installed)."""
    _refstubs.patch_ddim_sampler_cpu()
    _refstubs.patch_vae_sample_to_mode()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_test_geo4d", "/root/reference/scripts/evaluation/test_geo4d.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_torch_models():
    """Tiny-width full-topology reference LatentVisualDiffusion + pointmap
    VAE, built by the reference's own instantiate_from_config from an
    inference_geo4d.yaml-shaped config tree (stand-in CLIP targets).
    Reused by tests/test_convert_files.py for the file-format rehearsal."""
    from utils.utils import instantiate_from_config

    AD = _refstubs.AttrDict.wrap
    cfg = AD({
        "target": "lvdm.models.ddpm3d.LatentVisualDiffusion",
        "params": {
            "rescale_betas_zero_snr": True,
            "parameterization": "v",
            "linear_start": 0.00085,
            "linear_end": 0.012,
            "timesteps": 1000,
            "modality": "pc_ray_cross_depth",
            "conditioning_key": "hybrid",
            "image_size": [H_PX // 8, W_PX // 8],
            "channels": 16,
            "scale_factor": 0.18215,
            "use_dynamic_rescale": True,
            "base_scale": 0.7,
            "use_ema": False,
            "uncond_type": "empty_seq",
            "cross_attention": True,
            "first_stage_key": "video",
            "unet_config": {
                "target": "lvdm.modules.networks.openaimodel3d.UNetModel",
                "params": dict(
                    in_channels=20, out_channels=16, use_linear=True,
                    use_checkpoint=False, temporal_conv=True,
                    temporal_attention=True, temporal_selfatt_only=True,
                    use_relative_position=False, use_causal_attention=False,
                    fs_condition=True, **UNET_KW,
                ),
            },
            "first_stage_config": {
                "target": "lvdm.models.autoencoder.AutoencoderKL",
                "params": {
                    "embed_dim": 4,
                    "lossconfig": {"target": "torch.nn.Identity"},
                    "ddconfig": VAE_DD,
                },
            },
            "cond_stage_config": {"target": "xcheck_standins.TinyTextEncoder"},
            "img_cond_stage_config": {
                "target": "xcheck_standins.TinyImageEmbedder"
            },
            "image_proj_stage_config": {
                "target": "lvdm.modules.encoders.resampler.Resampler",
                "params": dict(ff_mult=4, **RESAMPLER_KW),
            },
        },
    })
    model = instantiate_from_config(cfg)
    model.load_state_dict(_randomize_sd(model, 7), strict=False)
    model.perframe_ae = False
    model.eval()

    # fine-tuned pointmap VAE (run_inference :330-347)
    pm_cfg = AD({
        "target": "lvdm.models.autoencoder.AutoencoderKL",
        "params": {
            "embed_dim": 4,
            "lossconfig": {"target": "torch.nn.Identity"},
            "ddconfig": VAE_DD,
            "adaptorconfig": VAE_AD,
        },
    })
    pm_vae = instantiate_from_config(pm_cfg)
    pm_vae.load_state_dict(_randomize_sd(pm_vae, 8), strict=False)
    pm_vae.eval()
    return model, pm_vae


@pytest.fixture(scope="module")
def torch_model(ref):
    return build_torch_models()


def build_jax_model(torch_model):
    """Our GeoDiffusion twin with the torch weights converted through the
    PRODUCTION key rules + prefixes (cli/common.py:69-78 semantics)."""
    from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig
    from geo4d_tpu.models.convert import (
        convert_state_dict,
        resampler_torch_key,
        unet_torch_key,
        vae_torch_key,
    )
    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.models.unet3d import UNet3D
    from geo4d_tpu.nn.resampler import Resampler

    class XCheckGeo(GeoDiffusion):
        """Stand-in conditioning + deterministic (mode) VAE encode; the rest
        is the production model."""

        def embed_frames(self, params, frames):
            b, t = frames.shape[:2]
            tokens = standins.embed_frames_jax(
                frames.reshape(b * t, *frames.shape[2:])
            )
            tokens = tokens.reshape(b, t, *tokens.shape[1:])
            return self.resampler.apply(params["resampler"], tokens)

        def encode_first_stage_chunked(self, params, frames, key=None):
            # posterior mode, mirroring patch_vae_sample_to_mode on torch side
            return self.encode_first_stage(params, frames, None)

    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                        adaptor_ch=32)
    model = XCheckGeo(
        unet=UNet3D(dtype=jnp.float32, **UNET_KW),
        vae=AutoencoderKL(cfg=vae_cfg, with_adaptor=False, dtype=jnp.float32),
        pointmap_vae=AutoencoderKL(cfg=vae_cfg, with_adaptor=True,
                                   dtype=jnp.float32),
        resampler=Resampler(dtype=jnp.float32, **RESAMPLER_KW),
    )

    tm, pm_vae = torch_model
    full_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    pm_sd = {k: v.detach().numpy() for k, v in pm_vae.state_dict().items()}

    with jax.default_device(CPU):
        templates = {
            "unet": jax.eval_shape(
                lambda k: model.unet.init(
                    k,
                    jnp.zeros((1, T, H_PX // 8, W_PX // 8, 20)),
                    jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, 77 + T * 16, CTX)),
                    jnp.zeros((1,), jnp.int32),
                ),
                jax.random.PRNGKey(0),
            ),
            "vae": jax.eval_shape(
                lambda k: model.vae.init(k, jnp.zeros((1, H_PX, W_PX, 3))),
                jax.random.PRNGKey(0),
            ),
            "pointmap_vae": jax.eval_shape(
                lambda k: model.pointmap_vae.init(
                    k, jnp.zeros((1, H_PX, W_PX, 3)),
                    method=model.pointmap_vae.init_all,
                ),
                jax.random.PRNGKey(0),
            ),
            "resampler": jax.eval_shape(
                lambda k: model.resampler.init(
                    k, jnp.zeros((1, T, standins.N_TOKENS, standins.VIS_DIM))
                ),
                jax.random.PRNGKey(0),
            ),
        }
        params = {}
        for name, key_fn, prefix, sd in [
            ("unet", unet_torch_key, "model.diffusion_model.", full_sd),
            ("vae", vae_torch_key, "first_stage_model.", full_sd),
            ("resampler", resampler_torch_key, "image_proj_model.", full_sd),
            ("pointmap_vae", vae_torch_key, "", pm_sd),
        ]:
            params[name], missing, used = convert_state_dict(
                sd, templates[name], key_fn, prefix
            )
            assert not missing, f"{name}: unfilled leaves {missing[:8]}"
    return model, params


@pytest.fixture(scope="module")
def jax_model(torch_model):
    return build_jax_model(torch_model)


def _make_video(seed=11):
    """Smooth structured video in [-1,1], (1, 3, N, H, W) torch layout."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H_PX, 0:W_PX].astype(np.float32) / H_PX
    frames = []
    for i in range(N_FRAMES):
        phase = i / N_FRAMES
        r = np.sin(2 * np.pi * (xx + phase)) * 0.6
        g = np.cos(2 * np.pi * (yy - 0.5 * phase)) * 0.6
        b = np.sin(2 * np.pi * (xx * yy + phase)) * 0.6
        frames.append(np.stack([r, g, b], 0))
    vid = np.stack(frames, 1)[None]  # (1, 3, N, H, W)
    vid += rng.normal(size=vid.shape).astype(np.float32) * 0.02
    return np.clip(vid, -1, 1).astype(np.float32)


def _window_slices():
    """The reference's sliding-window slice list (test_geo4d.py:417-423)."""
    slices = []
    for start in range(0, N_FRAMES - T + 1, 4):
        slices.append(slice(start, start + T, 1))
    if slice(N_FRAMES - T, N_FRAMES) not in slices:
        slices.append(slice(N_FRAMES - T, N_FRAMES, 1))
    return slices


def _torch_pipeline(ref, torch_model, video, x_T_windows, fps,
                    cfg_scale=1.0, cfg_img=None, multiple_cond_cfg=False):
    """Run the reference per-window pipeline: image_guided_synthesis + the
    post block of run_inference (test_geo4d.py:441-499), verbatim order."""
    model, pm_vae = torch_model
    videos_all = torch.from_numpy(video)
    noise_shape = [1, 16, T, H_PX // 8, W_PX // 8]
    outs = []
    with torch.no_grad():
        for widx, sl in enumerate(_window_slices()):
            videos = videos_all[:, :, sl, :, :].clone()
            batch_samples = ref.image_guided_synthesis(
                model, [PROMPT], videos, noise_shape, 1, 5, 0.0,
                cfg_scale, cfg_img, fps, True, multiple_cond_cfg, False,
                False, "uniform_trailing", 0.7, pointmap_vae=pm_vae,
                x_T=torch.from_numpy(x_T_windows[widx])[None],
            )
            assert batch_samples.shape[1] == 1
            batch_samples = batch_samples[:, 0]

            # --- post block (test_geo4d.py:451-499) ---
            from einops import rearrange

            raymap = batch_samples[:, 4:7]
            crossmap = batch_samples[:, 7:10]
            traj = ref.raymap_to_camera_matrix(raymap, crossmap)
            inverse_depthmap = batch_samples[:, 10:11]
            inverse_depthmap = rearrange(inverse_depthmap, "b c t h w -> (b t) c h w")
            inverse_depthmap = rearrange(inverse_depthmap, "t c h w -> t h w c")
            inverse_depthmap = (inverse_depthmap + 1.0) / 2.0

            pc = batch_samples[:, :4]
            x_recon = rearrange(pc, "b c t h w -> (b t) c h w")
            confidence = torch.nn.Softplus()(x_recon[:, [-1], :, :])
            confidence = rearrange(confidence, "t c h w -> t h w c")
            x_recon = x_recon[:, :-1, :, :]
            x_recon_reshape = rearrange(x_recon, "t c h w -> t h w c")
            invalid_pts = ref.get_sky_mask(x_recon_reshape, sky_value=1.05, eps=0.35)
            invalid_pts = invalid_pts | ref.get_far_away_mask(
                x_recon_reshape, far_away_value=1.99
            )
            confidence[invalid_pts] = 999.0
            inverse_confidence = 1 / confidence
            inverse_confidence[invalid_pts] = 0.0
            x_recon = rearrange(x_recon, "t c h w -> t h w c")
            x_recon = ref.denormalize_pc_bbox2(x_recon, alpha=2.0, beta=2.0)

            outs.append({
                "pts3d": x_recon.numpy(),
                "conf": inverse_confidence[..., 0].numpy(),
                "valid": (~invalid_pts[..., 0]).numpy(),
                "inv_depth": inverse_depthmap[..., 0].numpy(),
                "traj": traj.numpy(),
            })
    return {k: np.stack([o[k] for o in outs]) for k in outs[0]}


def _jax_pipeline(jax_model, video, x_T_windows, fps,
                  cfg_scale=1.0, cfg_img=None):
    from geo4d_tpu.pipeline.inference import InferenceConfig, WindowPredictor

    model, params = jax_model
    cfg = InferenceConfig(window=T, stride=4, cfg_scale=cfg_scale,
                          cfg_img=cfg_img)
    slices = _window_slices()
    frames = video[0].transpose(1, 2, 3, 0)  # (N, H, W, 3)
    windows = np.stack([frames[sl] for sl in slices])
    x_T = x_T_windows.transpose(0, 2, 3, 4, 1)  # (G,16,T,h,w)->(G,T,h,w,16)
    with jax.default_device(CPU):
        pred = WindowPredictor(model, params, cfg).predict_windows(
            windows,
            standins.text_context(PROMPT)[None],
            fps,
            uncond_text_ctx=standins.text_context("")[None],
            x_T=x_T,
        )
    return pred


@pytest.fixture(scope="module")
def x_T_windows():
    rng = np.random.default_rng(42)
    g = len(_window_slices())
    return rng.standard_normal((g, 16, T, H_PX // 8, W_PX // 8)).astype(np.float32)


@pytest.fixture(scope="module")
def pipelines(ref, torch_model, jax_model, x_T_windows):
    video = _make_video()
    ref_out = _torch_pipeline(ref, torch_model, video, x_T_windows, fps=10)
    ours = _jax_pipeline(jax_model, video, x_T_windows, fps=10)
    return ref_out, ours


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


# f32 reduction-order noise accumulates through 5 UNet steps + a VAE decode;
# measured ~1e-3 at O(1) activation scales. A pipeline-order bug (wrong mask
# order, conf inversion, off-by-one timestep) produces O(1) diffs.
TOL_MAP = 2e-2
TOL_TRAJ = 2e-2


def test_pts3d_match(pipelines):
    ref_out, ours = pipelines
    assert ours["pts3d"].shape == ref_out["pts3d"].shape
    assert np.std(ref_out["pts3d"]) > 1e-3  # non-degenerate oracle
    assert _maxdiff(ours["pts3d"], ref_out["pts3d"]) < TOL_MAP


def test_confidence_and_masks_match(pipelines):
    ref_out, ours = pipelines
    # valid masks must agree exactly except at threshold-straddling pixels
    agree = np.mean(ours["valid"] == ref_out["valid"])
    assert agree > 0.999, f"valid-mask agreement {agree}"
    both_valid = ours["valid"] & ref_out["valid"]
    d = np.abs(ours["conf"] - ref_out["conf"])[both_valid]
    assert d.max() < TOL_MAP


def test_inv_depth_match(pipelines):
    ref_out, ours = pipelines
    assert _maxdiff(ours["inv_depth"], ref_out["inv_depth"]) < TOL_MAP


def test_traj_match(pipelines):
    ref_out, ours = pipelines
    assert ours["traj"].shape == ref_out["traj"].shape  # (G, T, 4, 4)
    assert _maxdiff(ours["traj"], ref_out["traj"]) < TOL_TRAJ
    # rotations must be genuine (oracle non-degeneracy)
    R = ref_out["traj"][..., :3, :3]
    eye = np.eye(3)
    assert np.abs(R @ np.swapaxes(R, -1, -2) - eye).max() < 1e-2


def test_cfg_branch_wiring(ref, torch_model, jax_model, x_T_windows):
    """CFG scale 2.0 + guidance_rescale 0.7: exercises the uncond branch
    (empty prompt + zero-image embedding) and the rescale path."""
    video = _make_video(seed=13)
    ref_out = _torch_pipeline(ref, torch_model, video, x_T_windows, fps=10,
                              cfg_scale=2.0)
    ours = _jax_pipeline(jax_model, video, x_T_windows, fps=10, cfg_scale=2.0)
    assert _maxdiff(ours["pts3d"], ref_out["pts3d"]) < TOL_MAP
    assert _maxdiff(ours["inv_depth"], ref_out["inv_depth"]) < TOL_MAP


def test_multicond_cfg_wiring(ref, torch_model, jax_model, x_T_windows):
    """3-way CFG (ddim_multiplecond.py:220-234): text scale 2.0, img 1.5."""
    video = _make_video(seed=17)
    ref_out = _torch_pipeline(ref, torch_model, video, x_T_windows, fps=10,
                              cfg_scale=2.0, cfg_img=1.5,
                              multiple_cond_cfg=True)
    ours = _jax_pipeline(jax_model, video, x_T_windows, fps=10,
                         cfg_scale=2.0, cfg_img=1.5)
    assert _maxdiff(ours["pts3d"], ref_out["pts3d"]) < TOL_MAP


# ------------------------------------------------------------------------
# roma stub self-tests: the aligner cross-check (test_xcheck_aligner.py)
# relies on these implementations being correct.
# ------------------------------------------------------------------------


def test_roma_stub_quat_roundtrip():
    import roma
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    R = torch.from_numpy(
        Rotation.random(16, random_state=rng).as_matrix().astype(np.float32)
    )
    q = roma.rotmat_to_unitquat(R)
    R2 = roma.unitquat_to_rotmat(q)
    assert torch.abs(R - R2).max() < 1e-5


def test_roma_stub_rigid_registration():
    import roma
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(4)
    x = torch.from_numpy(rng.standard_normal((500, 3)).astype(np.float32))
    R_true = torch.from_numpy(
        Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    )
    s_true, t_true = 1.7, torch.tensor([0.3, -1.2, 2.0])
    y = s_true * x @ R_true.T + t_true
    w = torch.from_numpy(rng.uniform(0.5, 2.0, 500).astype(np.float32))
    R, t, s = roma.rigid_points_registration(x, y, weights=w, compute_scaling=True)
    assert torch.abs(R - R_true).max() < 1e-4
    assert abs(float(s) - s_true) < 1e-4
    assert torch.abs(t - t_true).max() < 1e-4
    # homogeneous codec
    q = roma.rotmat_to_unitquat(R_true)
    M = roma.RigidUnitQuat(q * 2.0, t_true).normalize().to_homogeneous()
    assert torch.abs(M[:3, :3] - R_true).max() < 1e-5
    assert torch.abs(M[:3, 3] - t_true).max() < 1e-6
