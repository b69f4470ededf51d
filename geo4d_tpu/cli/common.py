"""Shared CLI plumbing: model building, checkpoint loading, conditioning."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_checkpoint(path: str):
    """torch.load with weights_only=True first; fall back (with a warning)
    for DeepSpeed-style container checkpoints that pickle non-tensor state.
    Arbitrary-pickle execution is opt-in, not the default."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        print(
            f"[ckpt] WARNING: {path} is not a plain-tensor checkpoint; "
            "falling back to full unpickling — only load trusted files"
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def build_model_and_params(
    ckpt_path: Optional[str] = None,
    vae_ckpt_path: Optional[str] = None,
    image_size: Tuple[int, int] = (256, 576),
    seed: int = 123,
    verbose: bool = True,
):
    """Flagship GeoDiffusion + params: converted from torch checkpoints when
    given (infer_geo4d.py:53-80 + :330-347 loading semantics), else random."""
    import jax

    from geo4d_tpu.core.cache import enable_persistent_compile_cache
    from geo4d_tpu.models.presets import flagship, init_params

    # restarted CLI runs deserialize the multi-minute UNet/aligner compiles
    # instead of repaying them (no-op if the user already configured a dir)
    enable_persistent_compile_cache()

    model = flagship()
    params = init_params(model, jax.random.PRNGKey(seed), image_size)
    model, params = _load_checkpoints_into(
        model, params, ckpt_path, vae_ckpt_path, verbose
    )
    return model, params


def _load_checkpoints_into(model, params, ckpt_path, vae_ckpt_path, verbose):
    """Fill a params pytree from the published torch checkpoints
    (infer_geo4d.py:53-80 + :330-347 loading semantics)."""
    from geo4d_tpu.models.convert import (
        clip_text_torch_key,
        clip_vision_torch_key,
        convert_state_dict,
        resampler_torch_key,
        strip_prefixes,
        unet_torch_key,
        vae_torch_key,
    )

    if ckpt_path and os.path.exists(ckpt_path):
        sd = strip_prefixes(load_torch_checkpoint(ckpt_path))
        reports = {}
        for name, key_fn, prefix in [
            ("unet", unet_torch_key, "model.diffusion_model."),
            ("vae", vae_torch_key, "first_stage_model."),
            ("clip_text", clip_text_torch_key, "cond_stage_model.model."),
            ("clip_img", clip_vision_torch_key, "embedder.model."),
            ("resampler", resampler_torch_key, "image_proj_model."),
        ]:
            params[name], missing, used = convert_state_dict(
                sd, params[name], key_fn, prefix
            )
            reports[name] = (len(missing), len(used))
        if verbose:
            for name, (m, u) in reports.items():
                print(f"[ckpt] {name}: {u} tensors loaded, {m} missing")

    if vae_ckpt_path and os.path.exists(vae_ckpt_path):
        raw = load_torch_checkpoint(vae_ckpt_path)
        raw = raw.get("state_dict", raw)
        # vae.ckpt keys are 'model.'-prefixed (infer_geo4d.py:342-346)
        sd = {k[6:]: v for k, v in raw.items() if k.startswith("model.")}
        params["pointmap_vae"], missing, used = convert_state_dict(
            sd, params["pointmap_vae"], vae_torch_key
        )
        if verbose:
            print(f"[ckpt] pointmap_vae: {used and len(used)} loaded, "
                  f"{len(missing)} missing")
    return model, params


def build_model_from_config(config_path: str, ckpt_path=None, vae_ckpt_path=None,
                            image_size=(256, 576), seed: int = 123,
                            verbose: bool = True):
    """Reference-layout YAML -> (model, params, postprocess dict).

    An unmodified reference configs/inference_geo4d.yaml drives the whole
    build (test_geo4d.py:316-321 semantics): model tree via the registry,
    postprocess block returned for AlignerConfig mapping.
    """
    import jax

    from geo4d_tpu.core.registry import build_from_yaml
    from geo4d_tpu.models.presets import init_params

    model, postprocess = build_from_yaml(config_path)
    params = init_params(model, jax.random.PRNGKey(seed), image_size)
    model2, params = _load_checkpoints_into(
        model, params, ckpt_path, vae_ckpt_path, verbose
    )
    return model, params, postprocess


def aligner_config_from_postprocess(pp: dict, n_iter: Optional[int] = None):
    """Map the reference postprocess block (configs/inference_geo4d.yaml:
    169-186) onto AlignerConfig. Unknown keys are ignored; flow/motion
    knobs are live (beyond the reference, whose group optimizer stores but
    never applies them — optimizer_group.py:37-52)."""
    from geo4d_tpu.alignment.optimizer import AlignerConfig

    fn = {"smooth_l1": "l1", "l1": "l1", "l2": "l2"}.get(
        str(pp.get("flow_loss_fn", "l1")), "l1"
    )
    return AlignerConfig(
        n_iter=int(n_iter if n_iter is not None else pp.get("n_iter", 500)),
        temporal_smoothing_weight=float(
            pp.get("temporal_smoothing_weight", 0.015)
        ),
        translation_weight=float(pp.get("translation_weight", 1.0)),
        schedule=str(pp.get("pose_schedule", "linear")),
        shared_focal=not bool(pp.get("not_shared_focal", False)),
        flow_loss_weight=float(pp.get("flow_loss_weight", 0.0)),
        flow_loss_fn=fn,
        flow_loss_start_frac=float(pp.get("flow_loss_start_epoch", 0.1)),
        motion_mask_thre=float(pp.get("motion_mask_thre", 0.35)),
        depth_regularize_weight=float(pp.get("depth_regularize_weight", 0.0)),
    )


def prepare_inference_params(model, params, prompt: str,
                             bpe_path: Optional[str] = None):
    """Inference-ready params: compute the cond-prompt AND empty-prompt
    text contexts once (the reference's uncond CFG branch embeds the empty
    prompt, test_geo4d.py:172-177), DROP the text tower (it's never used
    again — ~1.4 GB), and cast everything to bf16 (inference needs no f32
    masters; halves weight HBM).

    Returns (params_bf16, text_ctx, uncond_text_ctx) — each (1, 77, ctx_dim)
    np.float32."""
    import jax.numpy as jnp

    from geo4d_tpu.core.dtypes import cast_floating

    text_ctx = compute_text_context(model, params, prompt, bpe_path)
    if prompt == "":
        uncond_text_ctx = text_ctx
    else:
        uncond_text_ctx = compute_text_context(model, params, "", bpe_path)
    params = {k: v for k, v in params.items() if k != "clip_text"}
    return cast_floating(params, jnp.bfloat16), text_ctx, uncond_text_ctx


def compute_text_context(model, params, prompt: str, bpe_path: Optional[str] = None):
    """Prompt -> (1, 77, ctx_dim) context via BPE tokenize + text tower."""
    import jax
    import jax.numpy as jnp

    from geo4d_tpu.data.tokenizer import CLIPTokenizer

    if "clip_text" not in params:
        return np.zeros((1, 77, model.unet.context_dim), np.float32)
    tok = CLIPTokenizer(bpe_path)
    ids = tok([prompt])
    ctx = jax.jit(model.text_encoder.apply)(params["clip_text"], jnp.asarray(ids))
    return np.asarray(ctx)
