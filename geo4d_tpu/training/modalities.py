"""Modality batch builders: raw geometry -> diffusion training batches.

Parity target: reference lvdm/models/ddpm3d.py `shared_step` modality
dispatch (:1357-1384) over rgb/pc/pc_ray/pc_ray_cross_depth/... and the
shipped `get_batch_input_pc_ray_cross_depth` (:1661-1768):
  z0 = [pointmap(4) | raymap(4) | crossmap(4) | invdepth(4)] VAE latents,
  c_concat = video latent, context = [prompt | per-frame image tokens],
  classifier-free dropout: u < 2p drops TEXT (null prompt), p <= u < 3p
  drops IMAGE (zeroed frames through CLIP) — 5%/5%/5% at p=0.05
  (:1681-1689; overlap u<p drops both).

Geometry inputs arrive already normalized (geometry/normalize.py bbox2
schemes — utils/geometry.py:1083-1230); single-channel inverse depth is
repeated to 3 channels before VAE encode (:1702-1703).

All builders are jit-able pure functions of (params, batch, key).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from geo4d_tpu.models.diffusion import GeoDiffusion


def _encode(model: GeoDiffusion, params, frames, key):
    return model.encode_first_stage(params, frames, key)


def _cfg_dropout_masks(key, batch_size: int, uncond_prob: float, enabled: bool):
    """Returns (drop_text (B,), drop_image (B,)) booleans."""
    if not enabled or uncond_prob <= 0:
        z = jnp.zeros((batch_size,), bool)
        return z, z
    u = jax.random.uniform(key, (batch_size,))
    drop_text = u < 2 * uncond_prob
    drop_image = (u >= uncond_prob) & (u < 3 * uncond_prob)
    return drop_text, drop_image


def _conditioning(
    model: GeoDiffusion,
    params,
    video: jax.Array,            # (B, T, H, W, 3)
    prompt_emb: jax.Array,       # (B, 77, C) precomputed text embedding
    null_prompt_emb: jax.Array,  # (1, 77, C)
    key: jax.Array,
    uncond_prob: float,
    random_uncond: bool,
):
    b = video.shape[0]
    drop_text, drop_image = _cfg_dropout_masks(key, b, uncond_prob, random_uncond)
    prompt = jnp.where(
        drop_text[:, None, None],
        jnp.broadcast_to(null_prompt_emb, prompt_emb.shape),
        prompt_emb,
    )
    frames_in = jnp.where(drop_image[:, None, None, None, None], 0.0, video)
    img_ctx = model.embed_frames(params, frames_in)
    return jnp.concatenate([prompt, img_ctx], axis=1)


def build_batch_pc_ray_cross_depth(
    model: GeoDiffusion,
    params,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    prompt_emb: jax.Array,
    null_prompt_emb: jax.Array,
    uncond_prob: float = 0.05,
    random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """The shipped 16-ch geometry modality (ddpm3d.py:1661-1768).

    batch keys: normed_allpts, plucker_raymap, plucker_cross (B,T,H,W,3);
    inverse_depth (B,T,H,W,1); video (B,T,H,W,3); fps (B,).
    """
    keys = jax.random.split(key, 6)
    z_pc = _encode(model, params, batch["normed_allpts"], keys[0])
    z_ray = _encode(model, params, batch["plucker_raymap"], keys[1])
    z_cross = _encode(model, params, batch["plucker_cross"], keys[2])
    invd = jnp.repeat(batch["inverse_depth"], 3, axis=-1)
    z_depth = _encode(model, params, invd, keys[3])
    z_video = _encode(model, params, batch["video"], keys[4])

    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[5], uncond_prob, random_uncond,
    )
    z0 = jnp.concatenate([z_pc, z_ray, z_cross, z_depth], axis=-1)
    return {"z0": z0, "c_concat": z_video, "context": context, "fs": batch["fps"]}


def build_batch_pc_ray(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """8-ch [pointmap | raymap] modality (ddpm3d.py pc_ray branch)."""
    keys = jax.random.split(key, 4)
    z_pc = _encode(model, params, batch["normed_allpts"], keys[0])
    z_ray = _encode(model, params, batch["plucker_raymap"], keys[1])
    z_video = _encode(model, params, batch["video"], keys[2])
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[3], uncond_prob, random_uncond,
    )
    return {
        "z0": jnp.concatenate([z_pc, z_ray], axis=-1),
        "c_concat": z_video,
        "context": context,
        "fs": batch["fps"],
    }


def build_batch_pc(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """4-ch pointmap-only modality."""
    keys = jax.random.split(key, 3)
    z_pc = _encode(model, params, batch["normed_allpts"], keys[0])
    z_video = _encode(model, params, batch["video"], keys[1])
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[2], uncond_prob, random_uncond,
    )
    return {"z0": z_pc, "c_concat": z_video, "context": context, "fs": batch["fps"]}


def build_batch_rgb(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """Plain video-diffusion modality (the DynamiCrafter base task)."""
    keys = jax.random.split(key, 2)
    z = _encode(model, params, batch["video"], keys[0])
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[1], uncond_prob, random_uncond,
    )
    return {"z0": z, "c_concat": z, "context": context, "fs": batch["fps"]}


def build_batch_multipc(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """12-ch [pointmap_t0 | pointmap_t1 | video] two-view modality
    (ddpm3d.py multipc branch). batch carries normed_allpts and
    normed_allpts_1 (the second view's points)."""
    keys = jax.random.split(key, 5)
    z_pc0 = _encode(model, params, batch["normed_allpts"], keys[0])
    z_pc1 = _encode(model, params, batch["normed_allpts_1"], keys[1])
    z_video = _encode(model, params, batch["video"], keys[2])
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[3], uncond_prob, random_uncond,
    )
    return {
        "z0": jnp.concatenate([z_pc0, z_pc1, z_video], axis=-1),
        "c_concat": z_video,
        "context": context,
        "fs": batch["fps"],
    }


def build_batch_img_vidpc(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """8-ch [video | pointmap] joint video+geometry modality (ddpm3d.py
    img_vidpc branch): c_concat is the FIRST frame's latent repeated
    (test_geo4d.py:164-166), conditioning from frame 0 only."""
    keys = jax.random.split(key, 4)
    z_video = _encode(model, params, batch["video"], keys[0])
    z_pc = _encode(model, params, batch["normed_allpts"], keys[1])
    t = z_video.shape[1]
    c_concat = jnp.repeat(z_video[:, :1], t, axis=1)
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[2], uncond_prob, random_uncond,
    )
    return {
        "z0": jnp.concatenate([z_video, z_pc], axis=-1),
        "c_concat": c_concat,
        "context": context,
        "fs": batch["fps"],
    }


MODALITY_BUILDERS = {
    "pc_ray_cross_depth": build_batch_pc_ray_cross_depth,
    "pc_ray": build_batch_pc_ray,
    "pc": build_batch_pc,
    "rgb": build_batch_rgb,
    "multipc": build_batch_multipc,
    "img_vidpc": build_batch_img_vidpc,
}


def build_batch(modality: str, *args, **kwargs) -> Dict[str, jax.Array]:
    if modality not in MODALITY_BUILDERS:
        raise NotImplementedError(
            f"modality {modality!r}; available: {sorted(MODALITY_BUILDERS)}"
        )
    return MODALITY_BUILDERS[modality](*args, **kwargs)
