"""End-to-end video -> 4D inference pipeline.

Parity target: reference scripts/evaluation/test_geo4d.py `run_inference`
(:314-534) / infer_geo4d.py `run_evaluation` (:314-648): sliding 16-frame
windows (stride 4 + forced tail), per-window conditioned DDIM sampling
(`image_guided_synthesis` :118-274), geometry decode with conf head,
sky/far masking + softplus confidence -> inverse confidence (:466-488),
bbox2 denormalization (alpha=beta=2, :84-89,490), Plücker -> diffusion
cameras (:540-557), then group global alignment and results export.

TPU-first restructure of the hot path:
  * windows are BATCHED: instead of the reference's sequential per-window
    loop, all (or chunks of) windows run as one (G, T, ...) batch through
    CLIP/VAE/UNet — and shard across the mesh 'data' axis on multi-chip.
  * the whole per-window compute (encode -> 5-step DDIM scan -> 4-head
    decode) is one jitted function; host sees only final geometry maps.
  * post-diffusion masking/denormalization are fused into the same jit.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geo4d_tpu.alignment.init import init_from_group
from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner
from geo4d_tpu.data.video import sliding_windows
from geo4d_tpu.geometry.normalize import (
    denormalize_inverse_depth,
    denormalize_pointcloud_bbox2,
    far_mask,
    sky_mask,
)
from geo4d_tpu.geometry.rays import cameras_from_plucker
from geo4d_tpu.models.diffusion import GeoDiffusion


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Eval preset (scripts/eval_geo4d.sh / infer_geo4d.sh)."""

    window: int = 16
    stride: int = 4
    ddim_steps: int = 5
    ddim_eta: float = 0.0
    cfg_scale: float = 1.0
    cfg_img: Optional[float] = None
    timestep_spacing: str = "uniform_trailing"
    guidance_rescale: float = 0.7
    sky_value: float = 1.05
    sky_eps: float = 0.35
    far_value: float = 1.99
    denorm_alpha: float = 2.0
    denorm_beta: float = 2.0
    invalid_conf: float = 999.0
    window_batch: int = 1        # windows per device launch (raise on big chips)
    keep_plucker_maps: bool = False  # also return raw ray/cross maps (debug)
    sample_posterior: bool = True    # sample the VAE posterior (ddpm3d.py:674-681);
                                     # False = mode (deterministic cross-checks)


class WindowPredictor:
    """Runs the diffusion stage for batches of windows, fully jitted.

    With a multi-device `mesh`, windows shard across the mesh 'data' axis
    (the reference processes them sequentially on one GPU,
    infer_geo4d.py:412-418 — here W windows on D chips run in ceil(W/D)
    launches); params are replicated, no collectives needed in the forward.
    """

    def __init__(self, model: GeoDiffusion, params: Dict[str, Any],
                 config: InferenceConfig = InferenceConfig(),
                 mesh=None):
        self.model = model
        self.cfg = config
        self.mesh = mesh
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._window_sharding = NamedSharding(mesh, P("data"))
            self._repl = NamedSharding(mesh, P())
            params = jax.device_put(params, self._repl)
        else:
            self._window_sharding = None
            self._repl = None
        self.params = params

    def _tail_fn(self, params, ctx, uncond_ctx, uncond_img_ctx, z_video,
                 fs, key_samp, x_T=None):
        """Shared post-conditioning compute: DDIM scan -> 4-head decode ->
        masking/denormalization/Plücker cameras, all in-jit."""
        cfg = self.cfg
        model = self.model
        samples = model.sample_window(
            params, key_samp, ctx, z_video, fs,
            uncond_context=uncond_ctx,
            uncond_img_context=uncond_img_ctx,
            num_steps=cfg.ddim_steps,
            timestep_spacing=cfg.timestep_spacing,
            eta=cfg.ddim_eta,
            cfg_scale=cfg.cfg_scale,
            cfg_img=cfg.cfg_img,
            guidance_rescale=cfg.guidance_rescale,
            x_T=x_T,
        )
        dec = model.decode_geometry(params, samples)
        return self._postprocess(dec)

    def _window_fn(self):
        cfg = self.cfg
        model = self.model

        def run(params, frames, text_ctx, uncond_text_ctx, fs, key, x_T=None):
            """frames (B, T, H, W, 3) -> decoded geometry maps dict.

            Accepts uint8 (0..255) or float [-1,1] frames. uint8 ingest is
            the fast path: the host->device video upload is 4x smaller (the
            tunnel link measured 25-45 MB/s — a 56 MB f32 upload cost
            1.3-2.4 s of the diffusion stage) and the window gather moves
            4x fewer HBM bytes; normalization happens here in-jit with the
            exact host expression (data/video.py:99) so results match the
            float path bit-for-bit.
            """
            if frames.dtype == jnp.uint8:
                frames = (frames.astype(jnp.float32) / 255.0 - 0.5) * 2.0
            b, t = frames.shape[:2]
            img_ctx = model.embed_frames(params, frames)       # (B, T*16, C)
            bcast = lambda c: jnp.broadcast_to(c, (b, *c.shape[1:]))
            ctx = jnp.concatenate([bcast(text_ctx), img_ctx], axis=1)
            key_enc, key_samp = jax.random.split(key)
            if not cfg.sample_posterior:
                key_enc = None
            z_video = model.encode_first_stage_chunked(params, frames, key_enc)

            # CFG branches (test_geo4d.py:172-199): uncond = empty-prompt
            # text + zero-image; the multi-cond middle branch = empty-prompt
            # text + REAL image tokens (ddim_multiplecond.py:220-234)
            uncond_ctx = None
            uncond_img_ctx = None
            if cfg.cfg_scale != 1.0:
                zeros_img = model.embed_frames(params, jnp.zeros_like(frames))
                uncond_ctx = jnp.concatenate(
                    [bcast(uncond_text_ctx), zeros_img], axis=1
                )
                if cfg.cfg_img is not None and cfg.cfg_img != 1.0:
                    uncond_img_ctx = jnp.concatenate(
                        [bcast(uncond_text_ctx), img_ctx], axis=1
                    )

            return self._tail_fn(params, ctx, uncond_ctx, uncond_img_ctx,
                                 z_video, fs, key_samp, x_T)

        return run

    def _postprocess(self, dec):
        cfg = self.cfg

        # ---- masking + denormalization (fused on device) ----
        pc = dec["pointmap_conf"]
        pts, conf_raw = pc[..., :3], pc[..., 3]
        conf = jax.nn.softplus(conf_raw)
        invalid = sky_mask(pts, cfg.sky_value, cfg.sky_eps) | far_mask(
            pts, cfg.far_value
        )
        conf = jnp.where(invalid, cfg.invalid_conf, conf)
        inv_conf = jnp.where(invalid, 0.0, 1.0 / conf)
        pts = denormalize_pointcloud_bbox2(
            pts, cfg.denorm_alpha, cfg.denorm_beta
        )
        inv_depth = denormalize_inverse_depth(dec["inv_depth"][..., 0])
        # diffusion cameras recovered INSIDE the jit: avoids fetching the
        # 6 ray/cross channels to host (~50 MB/window on a remote link)
        # and a separate device launch per window
        traj = jax.vmap(
            lambda r, m: cameras_from_plucker(r, m)[0]
        )(dec["raymap"], dec["crossmap"])
        # finite guards IN-JIT: degenerate samples (random/corrupt
        # weights) must not poison the downstream solvers, and guarding
        # here keeps the outputs device-resident for the aligner
        pts = jnp.clip(
            jnp.nan_to_num(pts, nan=0.0, posinf=1e4, neginf=-1e4),
            -1e4, 1e4,
        )
        inv_conf = jnp.clip(jnp.nan_to_num(inv_conf, nan=0.0), 0.0, 1e6)
        inv_depth = jnp.nan_to_num(inv_depth, nan=0.0)
        traj = jnp.nan_to_num(traj, nan=0.0)
        out = {
            "pts3d": pts,
            "conf": inv_conf,
            "valid": ~invalid,
            "inv_depth": inv_depth,
            "traj": traj,
        }
        if cfg.keep_plucker_maps:
            out["raymap"] = dec["raymap"]
            out["crossmap"] = dec["crossmap"]
        return out

    def _video_fn(self):
        """Like `_window_fn` but takes the FULL video + per-window frame
        indices; the frame-level towers run over UNIQUE frames exactly once.

        Stride-4 windows overlap 75%, so the per-window path runs the CLIP
        vision tower and the VAE encoder on every frame up to 4x (2.5x at
        the bench shapes). Both are per-frame independent (condition.py
        :342-372 per-frame ViT; ddpm3d.py:683-707 perframe encode), so:
        upload the video once, CLIP-tokenize + VAE-encode each frame once,
        and GATHER the per-frame latents/tokens into windows on device —
        identical math with ~60% less conditioning compute at 75% overlap.
        The RESAMPLER still runs per window: its query bank is window-
        position dependent (resampler.py:137-140 — frame k reads query
        slice k), so a frame's image-context tokens legitimately differ
        between windows.
        """
        cfg = self.cfg
        model = self.model

        def run_video(params, video, gidx, text_ctx, uncond_text_ctx, fs, key):
            if video.dtype == jnp.uint8:
                video = (video.astype(jnp.float32) / 255.0 - 0.5) * 2.0
            g, t = gidx.shape
            tok = model.clip_tokens_chunked(params, video)    # (N, 257, 1280)
            img_ctx = model.resample_tokens(params, tok[gidx])  # (G, T*16, C)
            bcast = lambda c: jnp.broadcast_to(c, (g, *c.shape[1:]))
            ctx = jnp.concatenate([bcast(text_ctx), img_ctx], axis=1)
            key_enc, key_samp = jax.random.split(key)
            # posterior noise is per unique frame (the reference re-samples
            # per window; parity is metric-level — SURVEY §7 PRNG discipline)
            if not cfg.sample_posterior:
                key_enc = None
            z_frames = model.encode_frames_chunked(params, video, key_enc)
            z_video = z_frames[gidx]                          # (G, T, h, w, 4)

            uncond_ctx = None
            uncond_img_ctx = None
            if cfg.cfg_scale != 1.0:
                # the zero-image embedding is identical for every frame:
                # embed ONE zero frame and broadcast to (G, T*16, C)
                zero_tok = model.embed_frames(
                    params, jnp.zeros((1, 1) + video.shape[1:], video.dtype)
                )                                              # (1, 16, C)
                zeros_img = jnp.broadcast_to(
                    jnp.tile(zero_tok, (1, t, 1)),
                    (g, t * 16, zero_tok.shape[-1]),
                )
                uncond_ctx = jnp.concatenate(
                    [bcast(uncond_text_ctx), zeros_img], axis=1
                )
                if cfg.cfg_img is not None and cfg.cfg_img != 1.0:
                    uncond_img_ctx = jnp.concatenate(
                        [bcast(uncond_text_ctx), img_ctx], axis=1
                    )

            return self._tail_fn(params, ctx, uncond_ctx, uncond_img_ctx,
                                 z_video, fs, key_samp)

        return run_video

    def _get_jitted(self, name: str, build):
        """Jit cache attached to the MODEL instance, not the predictor:
        `reconstruct` creates a fresh WindowPredictor per call, and a fresh
        `jax.jit(closure)` is a new cache entry — re-tracing the 1.44B-param
        graph every call (~30s/window over a remote-device link). Keying on
        (model, config) makes every same-config run reuse one executable."""
        cache = self.model.__dict__.setdefault("_jit_cache", {})
        key = (name, self.cfg)
        if key not in cache:
            import logging

            logging.getLogger("geo4d_tpu.pipeline").info(
                "predictor jit %r: NEW (name, config) cache entry — shapes "
                "seen for the first time will compile", name,
            )
            cache[key] = build()
        return cache[key]

    def predict_windows(
        self,
        frames_windows: np.ndarray,   # (G, T, H, W, 3)
        text_ctx: np.ndarray,         # (1, 77, 1024)
        fps: int,
        seed: int = 123,
        uncond_text_ctx: Optional[np.ndarray] = None,  # empty-prompt ctx
        x_T: Optional[np.ndarray] = None,     # (G, T, h, w, 16) initial noise
    ) -> Dict[str, np.ndarray]:
        """Run diffusion for all windows (chunked), then recover per-window
        diffusion cameras from the Plücker maps.

        `x_T` optionally fixes each window's initial DDIM noise (reference
        ddim.py:144-147 semantics) for reproducible replays/cross-checks."""
        cfg = self.cfg
        g_total = frames_windows.shape[0]
        run = self._get_jitted("run", lambda: jax.jit(self._window_fn()))

        outs: List[Dict[str, np.ndarray]] = []
        bs = cfg.window_batch
        if self._window_sharding is not None:
            # one window per device per launch (at least)
            bs = max(bs, self.mesh.size)
        if uncond_text_ctx is None:
            uncond_text_ctx = text_ctx
        key = jax.random.PRNGKey(seed)
        for start in range(0, g_total, bs):
            chunk = frames_windows[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            xt_chunk = None
            if x_T is not None:
                xt_chunk = np.asarray(x_T[start : start + bs], np.float32)
                if pad:
                    xt_chunk = np.concatenate(
                        [xt_chunk, np.repeat(xt_chunk[-1:], pad, 0)]
                    )
                xt_chunk = jnp.asarray(xt_chunk)
            key, sub = jax.random.split(key)
            fs = jnp.full((chunk.shape[0],), fps, jnp.int32)
            chunk_dev = jnp.asarray(chunk)
            if self._window_sharding is not None:
                chunk_dev = jax.device_put(chunk_dev, self._window_sharding)
            out = run(self.params, chunk_dev, jnp.asarray(text_ctx),
                      jnp.asarray(uncond_text_ctx), fs, sub, xt_chunk)
            out = {k: np.asarray(v) for k, v in out.items()}
            if pad:
                out = {k: v[:-pad] for k, v in out.items()}
            outs.append(out)
        return self._merge_outputs(outs)

    def predict_video(
        self,
        frames: np.ndarray,           # (N, H, W, 3): uint8 0..255 (preferred,
                                      # normalized on device) or float [-1,1]
        groups: np.ndarray,           # (G, T) int window -> frame indices
        text_ctx: np.ndarray,
        fps: int,
        seed: int = 123,
        uncond_text_ctx: Optional[np.ndarray] = None,
        return_device: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Diffusion over sliding windows with the video uploaded ONCE and
        windows gathered on device (stride-4 windows overlap 75% — per-window
        frame stacks re-send every frame up to 4x).

        `return_device=True` keeps every output on device (jax arrays) —
        the aligner consumes them in place, skipping a ~235 MB fetch +
        ~230 MB re-upload on a remote-device link."""
        cfg = self.cfg
        g_total = groups.shape[0]
        run = self._get_jitted("run_video", lambda: jax.jit(self._video_fn()))

        video_dev = jnp.asarray(frames)
        if self._repl is not None:
            video_dev = jax.device_put(video_dev, self._repl)
        if uncond_text_ctx is None:
            uncond_text_ctx = text_ctx
        bs = cfg.window_batch
        if self._window_sharding is not None:
            bs = max(bs, self.mesh.size)
        key = jax.random.PRNGKey(seed)
        outs: List[Dict[str, np.ndarray]] = []
        for start in range(0, g_total, bs):
            gidx = groups[start : start + bs]
            pad = bs - gidx.shape[0]
            if pad:
                gidx = np.concatenate([gidx, np.repeat(gidx[-1:], pad, 0)])
            key, sub = jax.random.split(key)
            fs = jnp.full((gidx.shape[0],), fps, jnp.int32)
            gidx_dev = jnp.asarray(gidx, jnp.int32)
            if self._window_sharding is not None:
                gidx_dev = jax.device_put(gidx_dev, self._window_sharding)
            out = run(self.params, video_dev, gidx_dev, jnp.asarray(text_ctx),
                      jnp.asarray(uncond_text_ctx), fs, sub)
            if not return_device:
                out = {k: np.asarray(v) for k, v in out.items()}
            if pad:
                out = {k: v[:-pad] for k, v in out.items()}
            outs.append(out)
        return self._merge_outputs(outs, device=return_device)

    @staticmethod
    def _merge_outputs(outs: List[Dict[str, np.ndarray]],
                       device: bool = False) -> Dict[str, np.ndarray]:
        cat = jnp.concatenate if device else np.concatenate
        return {
            k: cat([o[k] for o in outs], axis=0) for k in outs[0]
        }


def reconstruct(
    model: GeoDiffusion,
    params: Dict[str, Any],
    frames: np.ndarray,               # (T, H, W, 3): uint8 0..255 (preferred,
                                      # 4x cheaper upload) or float [-1, 1]
    text_ctx: np.ndarray,             # (1, 77, 1024) precomputed text context
    fps: int = 24,
    inference_config: InferenceConfig = InferenceConfig(),
    aligner_config: AlignerConfig = AlignerConfig(),
    seed: int = 123,
    intrinsics: Optional[np.ndarray] = None,
    mesh=None,
    verbose: bool = False,
    uncond_text_ctx: Optional[np.ndarray] = None,
) -> Tuple[GroupAligner, Dict[str, np.ndarray], Dict[str, float]]:
    """Full pipeline: windows -> diffusion -> group alignment.

    Returns (scene aligner, raw window predictions, timing dict).
    """
    t_total, h, w = frames.shape[:3]
    groups = sliding_windows(t_total, inference_config.window, inference_config.stride)

    predictor = WindowPredictor(model, params, inference_config, mesh=mesh)
    t0 = time.time()
    # device-resident handoff: the aligner builds its buffers from the
    # diffusion outputs IN PLACE (no prediction fetch / buffer re-upload)
    preds = predictor.predict_video(
        frames, groups, text_ctx, fps, seed, uncond_text_ctx=uncond_text_ctx,
        return_device=True,
    )
    jax.block_until_ready(preds["pts3d"])
    t_diffusion = time.time() - t0

    t0 = time.time()
    aligner = GroupAligner(
        groups,
        preds["pts3d"],
        preds["conf"],
        (h, w),
        invdepth=preds["inv_depth"],
        trajs=preds["traj"],
        config=aligner_config,
    )
    if intrinsics is not None:
        focals = [(K[0, 0] + K[1, 1]) / 2 for K in intrinsics]
        aligner.preset_focal(focals)
    init_from_group(aligner, preds["pts3d"], preds["conf"], verbose=verbose)
    aligner.run(verbose=verbose)
    t_align = time.time() - t0

    timing = {
        "diffusion_s": t_diffusion,
        "alignment_s": t_align,
        "frames": float(t_total),
        "sec_per_frame": (t_diffusion + t_align) / t_total,
    }
    return aligner, preds, timing
