"""Modality batch builders: raw geometry -> diffusion training batches.

Parity target: reference lvdm/models/ddpm3d.py `shared_step` modality
dispatch (:1357-1384) — ALL TEN branches: rgb, pc, pc_ray,
pc_ray_cross_depth (:1661), pc_task (:1367 + :1458 return_task), img_vidpc
(:2255), multipc (:2011), multipc_dynamic (:2130), novelview (:1883),
multimodality (:1772). The shipped `get_batch_input_pc_ray_cross_depth`:
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


def build_batch_pc_task(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """pc modality + per-batch integer task ids (ddpm3d.py:1367-1369:
    pc_task = get_batch_input_pc(return_task=True), the task tensor routed
    to the UNet's task embedding via the 'hybrid_task' conditioning key,
    :2545-2549). batch additionally carries 'task' (B,) int."""
    out = build_batch_pc(
        model, params, batch, key, prompt_emb, null_prompt_emb,
        uncond_prob, random_uncond,
    )
    out["task"] = batch["task"].astype(jnp.int32)
    return out


def build_batch_multimodality(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
) -> Dict[str, jax.Array]:
    """16-ch multi-task geometry modality (ddpm3d.py:1772-1882):
    z0 = [pointmap | normal map | optical flow | object coordinates]
    latents, each VAE-encoded from its own 3-ch map; c_concat = video
    latent; conditioning from the full video.

    batch keys: normed_allpts, normalmap, opticalflow, objectcoordinate
    (the reference spells the batch key 'objectcooridnate' —
    ddpm3d.py:1789 — accepted as an alias), video (B,T,H,W,3); fps (B,).
    """
    keys = jax.random.split(key, 6)
    obj = batch.get("objectcoordinate", batch.get("objectcooridnate"))
    z_pc = _encode(model, params, batch["normed_allpts"], keys[0])
    z_normal = _encode(model, params, batch["normalmap"], keys[1])
    z_flow = _encode(model, params, batch["opticalflow"], keys[2])
    z_obj = _encode(model, params, obj, keys[3])
    z_video = _encode(model, params, batch["video"], keys[4])
    context = _conditioning(
        model, params, batch["video"], prompt_emb, null_prompt_emb,
        keys[5], uncond_prob, random_uncond,
    )
    return {
        "z0": jnp.concatenate([z_pc, z_normal, z_flow, z_obj], axis=-1),
        "c_concat": z_video,
        "context": context,
        "fs": batch["fps"],
    }


def build_batch_novelview(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
    temporal_length: int = 16,
) -> Dict[str, jax.Array]:
    """8-ch novel-view modality (ddpm3d.py:1883-2010): multi-view clips are
    stacked along time as V views x temporal_length frames. The model
    denoises the LAST view's [pointmap latent | video latent] conditioned
    on the FIRST view's video latent channel-concatenated with the last
    view's Plücker raymap (the target-camera spec), and CLIP conditioning
    from the first view's frames.

    batch keys: normed_allpts (B, V*T, H, W, 3) all-view points,
    video (B, V*T, H, W, 3) all-view frames,
    plucker_raymap_all (B, V*T, h, w, C) raymaps at LATENT resolution
    (concatenated raw onto c_concat, ddpm3d.py:1988 '4 + 7 = 11'); fps (B,).
    """
    t = temporal_length
    keys = jax.random.split(key, 3)
    z_allview = _encode(model, params, batch["normed_allpts"], keys[0])
    z_video_allview = _encode(model, params, batch["video"], keys[1])

    z = z_allview[:, -t:]                      # last view's geometry latent
    z_video = z_video_allview[:, :t]           # first view's video latent
    z_video_otherview = z_video_allview[:, -t:]  # last view's video latent
    raymap_last = batch["plucker_raymap_all"][:, -t:]

    x_video = batch["video"][:, :t]
    context = _conditioning(
        model, params, x_video, prompt_emb, null_prompt_emb,
        keys[2], uncond_prob, random_uncond,
    )
    c_concat = jnp.concatenate(
        [z_video, raymap_last.astype(z_video.dtype)], axis=-1
    )
    return {
        "z0": jnp.concatenate([z, z_video_otherview], axis=-1),
        "c_concat": c_concat,
        "context": context,
        "fs": batch["fps"],
    }


def build_batch_multipc_dynamic(
    model, params, batch, key, prompt_emb, null_prompt_emb,
    uncond_prob: float = 0.05, random_uncond: bool = True,
    temporal_length: int = 16,
) -> Dict[str, jax.Array]:
    """Multi-view pointmaps + dynamic-mask modality (ddpm3d.py:2130-2254):
    V views stacked along time. z0 = [all views' pointmap latents (V*4) |
    all views' dynamic-mask latents (V*4) | other views' video latents
    ((V-1)*4)]; c_concat = first view's video latent; CLIP conditioning
    from the first view's frames.

    batch keys: normed_allpts, dynamic_mask, video — all (B, V*T, H, W, 3);
    fps (B,). With V=2 this is the 20-ch dynamic two-view task.
    """
    t = temporal_length
    keys = jax.random.split(key, 4)
    b, vt = batch["video"].shape[:2]
    v = vt // t

    def split_cat(z):  # (B, V*T, h, w, 4) -> (B, T, h, w, V*4)
        zs = [z[:, i * t : (i + 1) * t] for i in range(v)]
        return jnp.concatenate(zs, axis=-1)

    z_all = _encode(model, params, batch["normed_allpts"], keys[0])
    z_mask = _encode(model, params, batch["dynamic_mask"], keys[1])
    z_video_all = _encode(model, params, batch["video"], keys[2])

    z = split_cat(z_all)
    z_dyn = split_cat(z_mask)
    z_video = z_video_all[:, :t]
    z_other = jnp.concatenate(
        [z_video_all[:, i * t : (i + 1) * t] for i in range(1, v)], axis=-1
    )
    context = _conditioning(
        model, params, batch["video"][:, :t], prompt_emb, null_prompt_emb,
        keys[3], uncond_prob, random_uncond,
    )
    return {
        "z0": jnp.concatenate([z, z_dyn, z_other], axis=-1),
        "c_concat": z_video,
        "context": context,
        "fs": batch["fps"],
    }


MODALITY_BUILDERS = {
    "pc_ray_cross_depth": build_batch_pc_ray_cross_depth,
    "pc_ray": build_batch_pc_ray,
    "pc": build_batch_pc,
    "pc_task": build_batch_pc_task,
    "rgb": build_batch_rgb,
    "multipc": build_batch_multipc,
    "multipc_dynamic": build_batch_multipc_dynamic,
    "img_vidpc": build_batch_img_vidpc,
    "novelview": build_batch_novelview,
    "multimodality": build_batch_multimodality,
}


def build_batch(modality: str, *args, **kwargs) -> Dict[str, jax.Array]:
    if modality not in MODALITY_BUILDERS:
        raise NotImplementedError(
            f"modality {modality!r}; available: {sorted(MODALITY_BUILDERS)}"
        )
    return MODALITY_BUILDERS[modality](*args, **kwargs)
