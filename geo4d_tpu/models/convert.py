"""PyTorch checkpoint -> flax param conversion.

Parity target: the published Geo4D checkpoints — Lightning `state_dict`
and DeepSpeed `module.`-prefixed formats (scripts/evaluation/
infer_geo4d.py:53-80), the `framestride_embed` -> `fps_embedding` key
migration (:65-69), and the fine-tuned pointmap VAE loaded from vae.ckpt
with a `model.` prefix strip (:330-347).

Every flax leaf path is mapped to its torch key by structural rules (the
module trees were built to correspond 1:1); tensors are transposed to
channels-last conventions:
  Dense kernel   <- weight.T
  Conv2d kernel  <- weight.transpose(2, 3, 1, 0)     (O,I,kh,kw)->(kh,kw,I,O)
  Conv3d kernel  <- weight.transpose(2, 3, 4, 1, 0)
  GroupNorm/LayerNorm scale <- weight
  Embedding      <- as-is

`convert_state_dict` is validated by a synthetic round-trip test
(tests/test_convert.py); real-weight validation requires the published
.ckpt files (not present in this environment).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def forward_transform(flax_leaf_name: str, torch_arr: np.ndarray) -> np.ndarray:
    """torch tensor -> flax layout."""
    if flax_leaf_name == "kernel":
        if torch_arr.ndim == 2:
            return torch_arr.T
        if torch_arr.ndim == 3:
            # Conv1d kernel-1 (O, I, 1) -> Dense (I, O). The reference's
            # init_attn TemporalTransformer is built WITHOUT use_linear
            # (openaimodel3d.py:399-409) so its proj_in/proj_out are Conv1d.
            assert torch_arr.shape[-1] == 1, torch_arr.shape
            return torch_arr[:, :, 0].T
        if torch_arr.ndim == 4:
            return torch_arr.transpose(2, 3, 1, 0)
        if torch_arr.ndim == 5:
            return torch_arr.transpose(2, 3, 4, 1, 0)
    return torch_arr


def inverse_transform(flax_leaf_name: str, flax_arr: np.ndarray) -> np.ndarray:
    """flax layout -> torch layout (used for round-trip tests / export)."""
    if flax_leaf_name == "kernel":
        if flax_arr.ndim == 2:
            return flax_arr.T
        if flax_arr.ndim == 4:
            return flax_arr.transpose(3, 2, 0, 1)
        if flax_arr.ndim == 5:
            return flax_arr.transpose(4, 3, 0, 1, 2)
    return flax_arr


_LEAF = {"kernel": "weight", "bias": "bias", "scale": "weight",
         "embedding": "weight"}


def _resblock_field(parts: List[str]) -> Optional[str]:
    """ResBlock sub-path -> torch suffix (openaimodel3d.py ResBlock)."""
    f = parts[0]
    if f == "in_norm":
        return "in_layers.0"
    if f == "in_conv":
        return "in_layers.2"
    if f == "emb_proj":
        return "emb_layers.1"
    if f == "out_norm":
        return "out_layers.0"
    if f == "out_conv":
        return "out_layers.3"
    if f == "skip":
        return "skip_connection"
    if f == "temporal_conv":
        sub = parts[1]
        m = re.match(r"(norm|conv)(\d)", sub)
        k = m.group(2)
        if m.group(1) == "norm":
            return f"temopral_conv.conv{k}.0"   # [sic] reference typo
        return f"temopral_conv.conv{k}.{2 if k == '1' else 3}"
    return None


def _transformer_field(parts: List[str]) -> Optional[str]:
    """Spatial/TemporalTransformer sub-path -> torch suffix."""
    f = parts[0]
    if f == "norm":
        return "norm"
    if f in ("proj_in", "proj_out"):
        return f
    m = re.match(r"block_(\d+)", f)
    if m:
        d = m.group(1)
        g = parts[1]
        if g in ("norm1", "norm2", "norm3"):
            return f"transformer_blocks.{d}.{g}"
        if g in ("attn1", "attn2"):
            sub = parts[2]
            if sub == "to_out":
                return f"transformer_blocks.{d}.{g}.to_out.0"
            return f"transformer_blocks.{d}.{g}.{sub}"
        if g == "ff":
            sub = parts[2]
            if sub == "proj":
                return f"transformer_blocks.{d}.ff.net.0.proj"
            if sub == "out":
                return f"transformer_blocks.{d}.ff.net.2"
    return None


def unet_torch_key(flax_path: List[str]) -> Optional[str]:
    """Flax UNet3D param path -> torch key under model.diffusion_model."""
    parts = [p for p in flax_path if p not in ("params",)]
    # strip flax auto-wrappers
    parts = [p for p in parts if p not in ("Conv_0", "Dense_0", "GroupNorm_0")]
    leaf = parts[-1]
    body = parts[:-1]
    suffix = _LEAF[leaf]

    head = body[0]
    if head in ("time_embed", "fps_embedding", "task_embedding"):
        idx = {"fc1": 0, "fc2": 2}[body[1]]
        return f"{head}.{idx}.{suffix}"
    if head == "out_norm":
        return f"out.0.{suffix}"
    if head == "out_conv":
        return f"out.2.{suffix}"

    m = re.match(r"(input_blocks|output_blocks|middle_block|init_attn)_(\d+)(?:_(\d+))?", head)
    if not m:
        return None
    group, i, j = m.group(1), m.group(2), m.group(3)
    if group == "middle_block":
        prefix = f"middle_block.{i}"
    elif group == "init_attn":
        prefix = f"init_attn.{i}"
    else:
        prefix = f"{group}.{i}.{j}"

    rest = body[1:]
    if not rest:  # bare conv (stem / down / up)
        return f"{prefix}.{suffix}"
    if rest[0] == "op":  # Downsample
        return f"{prefix}.op.{suffix}"
    if rest[0] == "conv":  # Upsample
        return f"{prefix}.conv.{suffix}"
    field = _resblock_field(rest)
    if field is not None:
        return f"{prefix}.{field}.{suffix}"
    field = _transformer_field(rest)
    if field is not None:
        return f"{prefix}.{field}.{suffix}"
    return None


def vae_torch_key(flax_path: List[str]) -> Optional[str]:
    """Flax AutoencoderKL param path -> torch key (lvdm AutoencoderKL)."""
    parts = [p for p in flax_path if p not in ("params",)]
    parts = [p for p in parts if p not in ("Conv_0", "Dense_0", "GroupNorm_0")]
    leaf = parts[-1]
    body = parts[:-1]
    suffix = _LEAF[leaf]

    def resnet(parts):
        f = parts[0]
        if f in ("norm1", "conv1", "norm2", "conv2", "nin_shortcut"):
            return f
        return None

    head = body[0]
    if head in ("quant_conv", "post_quant_conv"):
        return f"{head}.{suffix}"
    if head in ("encoder", "decoder"):
        sub = body[1]
        if sub in ("conv_in", "conv_out", "norm_out"):
            return f"{head}.{sub}.{suffix}"
        m = re.match(r"(down|up)_(\d+)_block_(\d+)", sub)
        if m:
            field = resnet(body[2:])
            return f"{head}.{m.group(1)}.{m.group(2)}.block.{m.group(3)}.{field}.{suffix}"
        m = re.match(r"down_(\d+)_downsample", sub)
        if m:
            return f"{head}.down.{m.group(1)}.downsample.conv.{suffix}"
        m = re.match(r"up_(\d+)_upsample", sub)
        if m:
            return f"{head}.up.{m.group(1)}.upsample.conv.{suffix}"
        m = re.match(r"mid_(block_\d|attn_1)", sub)
        if m:
            tail = body[2] if len(body) > 2 else None
            if m.group(1) == "attn_1":
                return f"{head}.mid.attn_1.{tail}.{suffix}"
            field = resnet(body[2:])
            return f"{head}.mid.{m.group(1)}.{field}.{suffix}"
    if head in ("encoder_adaptor", "decoder_adaptor"):
        sub = body[1]
        if sub in ("conv_in", "conv_out", "norm_out"):
            return f"{head}.{sub}.{suffix}"
        m = re.match(r"block_(\d+)", sub)
        if m:
            field = resnet(body[2:])
            where = "down.0.block" if head == "encoder_adaptor" else "up.0.block"
            return f"{head}.{where}.{m.group(1)}.{field}.{suffix}"
    return None


def clip_text_torch_key(flax_path: List[str]) -> Optional[str]:
    """Flax CLIPTextEncoder path -> OpenCLIP text-tower torch key."""
    parts = [p for p in flax_path if p not in ("params",)]
    parts = [p for p in parts if p not in ("Dense_0",)]
    leaf = parts[-1]
    body = parts[:-1]
    if body and body[0] == "token_embedding":
        return "token_embedding.weight"
    if leaf == "positional_embedding":
        return "positional_embedding"
    if body and body[0] == "ln_final":
        return f"ln_final.{_LEAF[leaf]}"
    m = re.match(r"resblocks_(\d+)", body[0]) if body else None
    if m:
        i = m.group(1)
        sub = body[1]
        suffix = _LEAF[leaf]
        if sub in ("ln_1", "ln_2"):
            return f"transformer.resblocks.{i}.{sub}.{suffix}"
        if sub == "attn":
            field = body[2]
            if field == "in_proj":
                return f"transformer.resblocks.{i}.attn.in_proj_{suffix}"
            return f"transformer.resblocks.{i}.attn.out_proj.{suffix}"
        if sub == "mlp_fc":
            return f"transformer.resblocks.{i}.mlp.c_fc.{suffix}"
        if sub == "mlp_proj":
            return f"transformer.resblocks.{i}.mlp.c_proj.{suffix}"
    return None


def clip_vision_torch_key(flax_path: List[str]) -> Optional[str]:
    parts = [p for p in flax_path if p not in ("params", "Dense_0")]
    leaf = parts[-1]
    body = parts[:-1]
    if body and body[0] == "conv1":
        return "visual.conv1.weight"
    if leaf == "class_embedding":
        return "visual.class_embedding"
    if leaf == "positional_embedding":
        return "visual.positional_embedding"
    if body and body[0] == "ln_pre":
        return f"visual.ln_pre.{_LEAF[leaf]}"
    m = re.match(r"resblocks_(\d+)", body[0]) if body else None
    if m:
        key = clip_text_torch_key(["params"] + parts)
        return key.replace("transformer.", "visual.transformer.") if key else None
    return None


def resampler_torch_key(flax_path: List[str]) -> Optional[str]:
    parts = [p for p in flax_path if p not in ("params", "Dense_0")]
    leaf = parts[-1]
    body = parts[:-1]
    if leaf == "latents":
        return "latents"
    suffix = _LEAF[leaf]
    if body and body[0] in ("proj_in", "proj_out"):
        return f"{body[0]}.{suffix}"
    if body and body[0] == "norm_out":
        return f"norm_out.{suffix}"
    m = re.match(r"layers_(\d+)_(attn|ff)", body[0]) if body else None
    if m:
        i, kind = m.group(1), m.group(2)
        sub = body[1]
        if kind == "attn":
            return f"layers.{i}.0.{sub}.{suffix}"
        mapping = {"norm": "0", "fc1": "1", "fc2": "3"}
        return f"layers.{i}.1.{mapping[sub]}.{suffix}"
    return None


def strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Handle Lightning / DeepSpeed / vae.ckpt prefix conventions
    (infer_geo4d.py:53-80, :330-347)."""
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    if "module" in state_dict and isinstance(state_dict["module"], dict):
        # deepspeed: keys are '_forward_module.model.…', strip first 16 chars
        state_dict = {k[16:]: v for k, v in state_dict["module"].items()}
    out = {}
    for k, v in state_dict.items():
        k = k.replace("framestride_embed", "fps_embedding")
        out[k] = v
    return out


def convert_state_dict(
    torch_sd: Dict[str, Any],
    flax_template,
    key_fn: Callable[[List[str]], Optional[str]],
    torch_prefix: str = "",
) -> Tuple[Any, List[str], List[str]]:
    """Fill a flax param template from a torch state dict.

    Returns (params, missing_keys, mapped_torch_keys).
    """
    import jax

    missing: List[str] = []
    used: List[str] = []

    def fill(path, leaf):
        parts = [str(k.key) for k in path]
        tkey = key_fn(parts)
        full = torch_prefix + tkey if tkey else None
        if full is None or full not in torch_sd:
            missing.append("/".join(parts) + (f" -> {full}" if full else " (no rule)"))
            return leaf
        used.append(full)
        arr = forward_transform(parts[-1], _to_numpy(torch_sd[full]))
        if arr.shape != leaf.shape:
            missing.append(
                f"{'/'.join(parts)} -> {full}: shape {arr.shape} != {leaf.shape}"
            )
            return leaf
        # leaf may be a ShapeDtypeStruct (eval_shape template) or an array
        return arr.astype(np.dtype(leaf.dtype))

    params = jax.tree_util.tree_map_with_path(fill, flax_template)
    return params, missing, used
