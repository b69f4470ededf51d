"""GeoDiffusion: the latent visual diffusion model tying all towers together.

Parity target: reference lvdm/models/ddpm3d.py `LatentVisualDiffusion`
(:1332) + `DiffusionWrapper` (:2523) with the shipped `pc_ray_cross_depth`
modality (configs/inference_geo4d.yaml:38-156): 16-ch geometry latent
(pointmap 4 | raymap 4 | crossmap 4 | invdepth 4) denoised under hybrid
conditioning — the 4-ch video latent concatenated on channels (c_concat)
plus cross-attention context [text 77 | per-frame image tokens] (c_crossattn).

Functional design: module defs live on the dataclass; params are an explicit
pytree `{unet, vae, pointmap_vae, clip_text, clip_img, resampler}` so the
whole sampler jits/shards cleanly (no hidden state, no buffers).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from geo4d_tpu.core.schedules import DiffusionSchedule
from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig
from geo4d_tpu.models.unet3d import UNet3D
from geo4d_tpu.nn.clip import CLIPTextEncoder, CLIPVisionEncoder, clip_preprocess
from geo4d_tpu.nn.resampler import Resampler
from geo4d_tpu.sampling.ddim import DDIMTables, ddim_sample

SCALE_FACTOR = 0.18215  # SD latent scale (ddpm3d.py:55 / yaml:55)


@dataclasses.dataclass(frozen=True)
class GeoDiffusion:
    """Module bundle for the Geo4D latent diffusion system."""

    unet: UNet3D = UNet3D()
    vae: AutoencoderKL = AutoencoderKL(with_adaptor=False)
    pointmap_vae: Optional[AutoencoderKL] = AutoencoderKL(with_adaptor=True)
    text_encoder: CLIPTextEncoder = CLIPTextEncoder()
    image_encoder: CLIPVisionEncoder = CLIPVisionEncoder()
    resampler: Resampler = Resampler()
    schedule: DiffusionSchedule = dataclasses.field(
        default_factory=DiffusionSchedule.create
    )
    scale_factor: float = SCALE_FACTOR
    modality: str = "pc_ray_cross_depth"

    # ---------------- first stage (VAE) ----------------

    def encode_first_stage(
        self, params: Dict[str, Any], frames: jax.Array, key: Optional[jax.Array] = None
    ) -> jax.Array:
        """frames (B, T, H, W, 3) in [-1,1] -> scaled latents (B, T, h, w, 4).

        Samples the diagonal posterior when a key is given (the reference's
        get_first_stage_encoding samples, ddpm3d.py:674-681), else the mean.
        All frames batch through the encoder as one (B*T) batch — the
        reference's --perframe_ae loop is a CUDA memory workaround that XLA
        doesn't need.
        """
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        mean, logvar = self.vae.apply(params["vae"], flat, method=self.vae.encode)
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        else:
            z = mean
        z = self.scale_factor * z
        return z.reshape(b, t, *z.shape[1:])

    def _decode(self, vae, vae_params, z: jax.Array, method) -> jax.Array:
        b, t = z.shape[:2]
        flat = z.reshape(b * t, *z.shape[2:]) / self.scale_factor
        out = vae.apply(vae_params, flat, method=method)
        return out.reshape(b, t, *out.shape[1:])

    def decode_first_stage(self, params, z: jax.Array) -> jax.Array:
        """4-ch latents -> 3-ch frames through the RGB VAE decoder."""
        return self._decode(self.vae, params["vae"], z, self.vae.decode)

    def encode_first_stage_chunked(
        self, params, frames: jax.Array, key: Optional[jax.Array] = None
    ) -> jax.Array:
        """`encode_first_stage` with the window axis chunked via `lax.map`.

        For a batched-window launch (B windows x T frames) the flat
        (B*T)-frame encode would hold multi-GB full-res encoder activations;
        mapping over windows caps peak HBM at one window's working set with
        identical results (the per-window noise keys are split identically).
        """
        b = frames.shape[0]
        if b == 1 or key is None:
            return self.encode_first_stage(params, frames, key)
        keys = jax.random.split(key, b)
        z = jax.lax.map(
            lambda fk: self.encode_first_stage(params, fk[0][None], fk[1]),
            (frames, keys),
        )
        return z.reshape(b, *z.shape[2:])

    def encode_frames_chunked(
        self, params, frames: jax.Array, key: Optional[jax.Array] = None,
        chunk: int = 16,
    ) -> jax.Array:
        """Encode a FLAT frame axis (N, H, W, 3) -> (N, h, w, 4) latents,
        `chunk` frames per `lax.map` step (caps encoder activations at one
        window's working set for arbitrarily long videos)."""
        n = frames.shape[0]
        pad = (-n) % chunk
        fp = jnp.pad(frames, ((0, pad), (0, 0), (0, 0), (0, 0)))
        nb = fp.shape[0] // chunk
        fb = fp.reshape(nb, chunk, *frames.shape[1:])
        if nb == 1:
            z = self.encode_first_stage(params, fb, key)
        else:
            keys = (jax.random.split(key, nb) if key is not None
                    else jnp.zeros((nb, 2), jnp.uint32))

            def one(args):
                f, k = args
                kk = k if key is not None else None
                return self.encode_first_stage(params, f[None], kk)

            z = jax.lax.map(one, (fb, keys))
        return z.reshape(nb * chunk, *z.shape[-3:])[:n]

    def clip_tokens_chunked(
        self, params, frames: jax.Array, chunk: int = 16
    ) -> jax.Array:
        """CLIP ViT-H tokens over a FLAT frame axis: (N, H, W, 3) [-1,1]
        -> (N, 257, 1280), `chunk` frames per `lax.map` step.

        The vision tower is per-frame — only the resampler is NOT (its
        query bank is window-POSITION dependent, resampler.py:137-140:
        frame k reads query slice k), so callers gather these tokens into
        windows and run the resampler per window."""
        from geo4d_tpu.nn.clip import clip_preprocess

        n = frames.shape[0]
        pad = (-n) % chunk
        fp = jnp.pad(frames, ((0, pad), (0, 0), (0, 0), (0, 0)))
        nb = fp.shape[0] // chunk

        def clip_batch(f):
            return self.image_encoder.apply(
                params["clip_img"], clip_preprocess(f)
            )

        if nb == 1:
            tok = clip_batch(fp)
        else:
            tok = jax.lax.map(
                clip_batch, fp.reshape(nb, chunk, *frames.shape[1:])
            )
            tok = tok.reshape(nb * chunk, *tok.shape[2:])
        return tok[:n]

    def resample_tokens(self, params, tokens: jax.Array) -> jax.Array:
        """(B, T, 257, 1280) CLIP tokens -> (B, T*16, 1024) image context."""
        return self.resampler.apply(params["resampler"], tokens)

    def decode_pointmap_conf(self, params, z: jax.Array) -> jax.Array:
        """4-ch pointmap latents -> (…, 4) = [xyz | confidence].

        Uses the fine-tuned pointmap VAE's conf-adaptor branch
        (autoencoder.py decode_with_conf_adaptor :120-127); falls back to
        the RGB VAE with a constant confidence when absent.
        """
        if self.pointmap_vae is not None and "pointmap_vae" in params:
            return self._decode(
                self.pointmap_vae, params["pointmap_vae"], z,
                self.pointmap_vae.decode_with_conf,
            )
        rgb = self.decode_first_stage(params, z)
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)

    def decode_geometry(self, params, samples: jax.Array) -> Dict[str, jax.Array]:
        """Split the 16-ch sample into modality latents and decode all heads.

        Layout (ddpm3d.py:1661-1768 batch builder / test_geo4d.py:248-258):
        [0:4] pointmap (conf decode), [4:8] raymap, [8:12] crossmap,
        [12:16] inverse depth (3-ch decode then channel-mean).

        TPU restructure: the three RGB-VAE heads (ray/cross/depth) share
        weights, so they decode as ONE 3x-frames batch — one kernel stream
        through the decoder instead of three, better MXU occupancy at the
        full-res tail. The pointmap head keeps its own call (different
        weights: fine-tuned VAE + conf adaptor). When multiple windows are
        batched (B > 1) the window axis is chunked with `lax.map` so peak
        HBM stays at one window's full-res working set (3x16 + 16 frames)
        while the UNet upstream still sees the whole window batch.
        """
        b = samples.shape[0]

        def one_window(s):  # s: (1, T, h, w, 16)
            pc = self.decode_pointmap_conf(params, s[..., 0:4])
            rgb3 = jnp.concatenate(
                [s[..., 4:8], s[..., 8:12], s[..., 12:16]], axis=0
            )                                             # (3, T, h, w, 4)
            dec3 = self.decode_first_stage(params, rgb3)  # (3, T, H, W, 3)
            ray, cross, depth3 = dec3[0:1], dec3[1:2], dec3[2:3]
            depth = jnp.mean(depth3, axis=-1, keepdims=True)
            return {"pointmap_conf": pc, "raymap": ray, "crossmap": cross,
                    "inv_depth": depth}

        if b == 1:
            return one_window(samples)
        out = jax.lax.map(lambda s: one_window(s[None]), samples)
        # lax.map adds a leading axis over windows; each leaf is
        # (B, 1, T, H, W, C) -> (B, T, H, W, C)
        return {k: v.reshape(b, *v.shape[2:]) for k, v in out.items()}

    def decode_modality(self, params, samples: jax.Array,
                        modality: Optional[str] = None) -> Dict[str, jax.Array]:
        """Decode dispatch over the modality latent layouts
        (test_geo4d.py:231-258 inference branches):
          pc_ray_cross_depth  [pc4|ray4|cross4|depth4] (shipped; see
                              decode_geometry)
          pc_ray              [pc4|ray4]
          pc                  [pc4]
          multipc             [pc0_4|pc1_4|video4]
          img_vidpc           [video4|pc4]
          rgb                 [video4]
        """
        modality = modality or self.modality
        if modality == "pc_ray_cross_depth":
            return self.decode_geometry(params, samples)
        if modality == "pc_ray":
            return {
                "pointmap_conf": self.decode_pointmap_conf(params, samples[..., 0:4]),
                "raymap": self.decode_first_stage(params, samples[..., 4:8]),
            }
        if modality == "pc":
            return {"pointmap_conf": self.decode_pointmap_conf(params, samples)}
        if modality == "multipc":
            return {
                "pointmap_conf": self.decode_pointmap_conf(params, samples[..., 0:4]),
                "pointmap_conf_1": self.decode_pointmap_conf(params, samples[..., 4:8]),
                "video": self.decode_first_stage(params, samples[..., 8:12]),
            }
        if modality == "img_vidpc":
            return {
                "video": self.decode_first_stage(params, samples[..., 0:4]),
                "pointmap_conf": self.decode_pointmap_conf(params, samples[..., 4:8]),
            }
        if modality == "rgb":
            return {"video": self.decode_first_stage(params, samples)}
        raise NotImplementedError(f"modality {modality!r}")

    def encode_first_stage_perchannel(
        self, params, x: jax.Array, key: Optional[jax.Array] = None
    ) -> jax.Array:
        """Per-channel encode (ddpm3d.py:710-746): each input channel is
        tripled to RGB and encoded separately -> (B, T, h, w, 4*C) latents.
        vmapped over channels instead of the reference's python loop."""
        b, t, h, w, c = x.shape
        outs = []
        for ci in range(c):  # static tiny loop (c<=3), fully fused by XLA
            mono = jnp.repeat(x[..., ci : ci + 1], 3, axis=-1)
            outs.append(self.encode_first_stage(params, mono, key))
        return jnp.concatenate(outs, axis=-1)

    def decode_perchannel_conf(self, params, z: jax.Array) -> jax.Array:
        """Per-channel conf decode (ddpm3d.py decode_core_confhead_perchannel
        :872-919): 12-ch latent -> 3x conf decodes; each head's RGB collapses
        to its channel mean, confidences average -> (…, 4) output."""
        zc = z.shape[-1]
        n = 3
        per = zc // n
        assert zc % n == 0, f"latent channels {zc} not divisible by {n}"
        chans, confs = [], []
        for i in range(n):
            out = self.decode_pointmap_conf(params, z[..., i * per : (i + 1) * per])
            chans.append(jnp.mean(out[..., :3], axis=-1, keepdims=True))
            confs.append(out[..., 3:])
        conf = jnp.mean(jnp.concatenate(confs, axis=-1), axis=-1, keepdims=True)
        return jnp.concatenate(chans + [conf], axis=-1)

    # ---------------- conditioners ----------------

    def embed_text(self, params, token_ids: jax.Array) -> jax.Array:
        """(B, 77) int tokens -> (B, 77, 1024) context."""
        return self.text_encoder.apply(params["clip_text"], token_ids)

    def embed_frames(self, params, frames: jax.Array) -> jax.Array:
        """(B, T, H, W, 3) [-1,1] frames -> (B, T*16, 1024) image context.

        CLIP ViT-H tokens per frame -> frame-wise Perceiver resampler
        (reference test_geo4d.py:141-149 + resampler.py:135-150).
        """
        b, t = frames.shape[:2]
        flat = clip_preprocess(frames.reshape(b * t, *frames.shape[2:]))
        tokens = self.image_encoder.apply(params["clip_img"], flat)  # (B*T, 257, 1280)
        tokens = tokens.reshape(b, t, *tokens.shape[1:])
        return self.resampler.apply(params["resampler"], tokens)

    # ---------------- denoiser ----------------

    def apply_model(
        self,
        params,
        x: jax.Array,          # (B, T, h, w, 16) noisy geometry latents
        t: jax.Array,          # (B,) or (B, T) timesteps
        context: jax.Array,    # (B, 77 + T*16, 1024)
        c_concat: jax.Array,   # (B, T, h, w, 4) video latents
        fs: Optional[jax.Array] = None,
        task: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Hybrid conditioning: channel-concat video latent + cross-attn
        context (DiffusionWrapper 'hybrid', ddpm3d.py:2540-2544; the
        'hybrid_task' key additionally routes per-batch task ids,
        ddpm3d.py:2545-2549)."""
        xc = jnp.concatenate([x, c_concat], axis=-1)
        return self.unet.apply(params["unet"], xc, t, context, fs, task=task)

    def sample_window(
        self,
        params,
        key: jax.Array,
        context: jax.Array,            # cond context (B, L, C)
        c_concat: jax.Array,           # (B, T, h, w, 4)
        fs: jax.Array,                 # (B,)
        *,
        uncond_context: Optional[jax.Array] = None,
        uncond_img_context: Optional[jax.Array] = None,
        num_steps: int = 5,
        timestep_spacing: str = "uniform_trailing",
        eta: float = 0.0,
        cfg_scale: float = 1.0,
        cfg_img: Optional[float] = None,
        guidance_rescale: float = 0.7,
        x_T: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Denoise one 16-frame window -> (B, T, h, w, 16) geometry latents.

        `x_T` optionally fixes the initial noise (the reference sampler's
        x_T kwarg, ddim.py:144-147) — used by the pipeline cross-check and
        DDIM-inversion replays."""
        b, t, h, w, _ = c_concat.shape
        shape = (b, t, h, w, self.unet.out_channels)
        tables = DDIMTables.from_schedule(self.schedule, num_steps, timestep_spacing, eta)

        use_cfg = cfg_scale != 1.0
        multicond = use_cfg and (cfg_img is not None) and (cfg_img != 1.0)
        if use_cfg:
            assert uncond_context is not None
            ctxs = [context, uncond_context]
            if multicond:
                assert uncond_img_context is not None
                ctxs = [context, uncond_context, uncond_img_context]
            ctx_all = jnp.concatenate(ctxs, axis=0)
        else:
            ctx_all = context

        def model_fn(x_in, t_scalar, branches):
            bb = x_in.shape[0]
            cc = jnp.concatenate([c_concat] * branches, axis=0)
            ff = jnp.concatenate([fs] * branches, axis=0)
            tt = jnp.full((bb,), t_scalar, dtype=jnp.int32)
            return self.apply_model(params, x_in, tt, ctx_all, cc, ff)

        return ddim_sample(
            model_fn,
            shape,
            tables,
            key,
            parameterization=self.schedule.parameterization,
            cfg_scale=cfg_scale,
            cfg_img=cfg_img,
            guidance_rescale=guidance_rescale,
            x_T=x_T,
        )

    # ---------------- q-process (training) ----------------

    def q_sample(self, x_start, t, noise):
        """Forward noising (ddpm3d.py:344-355). t: (B,) int."""
        sa = jnp.asarray(self.schedule.sqrt_alphas_cumprod)[t]
        sb = jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return sa.reshape(shape) * x_start + sb.reshape(shape) * noise

    def get_v(self, x, noise, t):
        """v-target (ddpm3d.py:357-366)."""
        sa = jnp.asarray(self.schedule.sqrt_alphas_cumprod)[t]
        sb = jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x.ndim - 1)
        return sa.reshape(shape) * noise - sb.reshape(shape) * x
