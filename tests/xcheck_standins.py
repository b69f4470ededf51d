"""Deterministic tiny conditioner stand-ins for the end-to-end cross-check.

The reference's CLIP towers (open_clip ViT-H text + vision) are not
installable here, and CLIP itself is a frozen *external* encoder — what the
cross-check must pin is everything downstream of its tokens: the Resampler,
the [text 77 | image T*16] context concat order, the 77-token split inside
the UNet, CFG branch wiring, and the whole latent pipeline. So both sides
use the SAME deterministic stand-in encoders, defined once here from shared
numpy constants:

  * text encoder: prompt string -> fixed (77, CTX) array seeded by crc32 of
    the prompt (so cond and uncond/empty prompts differ deterministically)
  * image embedder: pixels in [-1,1] -> 4x4 average-pool patches + a global
    mean token -> fixed linear map + positional embedding -> (17, VIS) tokens

The torch classes are instantiated by the reference's instantiate_from_config
(this module is importable as top-level `xcheck_standins`); the JAX twins are
plain functions used by the GeoDiffusion subclass in the test.
"""

from __future__ import annotations

import zlib

import numpy as np

CTX_DIM = 64     # cross-attention context width (matches tiny UNet)
VIS_DIM = 48     # image-token width (matches tiny Resampler embedding_dim)
POOL = 4         # pool grid -> 16 patch tokens + 1 mean token
N_TOKENS = POOL * POOL + 1

_rng = np.random.default_rng(2024)
W_PATCH = (_rng.standard_normal((3, VIS_DIM)) * 0.2).astype(np.float32)
POS_EMB = (_rng.standard_normal((N_TOKENS, VIS_DIM)) * 0.1).astype(np.float32)


def text_context(prompt: str) -> np.ndarray:
    """(77, CTX_DIM) deterministic context for a prompt."""
    seed = zlib.crc32(prompt.encode("utf-8"))
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((77, CTX_DIM)) * 0.3).astype(np.float32)


def pool_tokens_np(x: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) float [-1,1] -> (N, 17, VIS_DIM) tokens (numpy oracle)."""
    n, h, w, _ = x.shape
    assert h % POOL == 0 and w % POOL == 0
    patches = x.reshape(n, POOL, h // POOL, POOL, w // POOL, 3).mean((2, 4))
    patches = patches.reshape(n, POOL * POOL, 3)
    mean_tok = x.mean(axis=(1, 2), keepdims=True).reshape(n, 1, 3)
    tok = np.concatenate([patches, mean_tok], axis=1)  # (N, 17, 3)
    return tok @ W_PATCH + POS_EMB[None]


# ----------------------------------------------------------------- torch ----
try:
    import torch
    import torch.nn.functional as F

    class TinyTextEncoder(torch.nn.Module):
        """Reference-side cond_stage stand-in (list[str] -> (B, 77, CTX))."""

        def forward(self, prompts):
            arrs = [text_context(p) for p in prompts]
            return torch.from_numpy(np.stack(arrs))

    class TinyImageEmbedder(torch.nn.Module):
        """Reference-side embedder stand-in ((B,3,H,W) [-1,1] -> (B,17,VIS))."""

        def forward(self, image):
            pooled = F.adaptive_avg_pool2d(image, POOL)          # (B,3,4,4)
            patches = pooled.permute(0, 2, 3, 1).reshape(image.shape[0], -1, 3)
            mean_tok = image.mean(dim=(2, 3))[:, None, :]        # (B,1,3)
            tok = torch.cat([patches, mean_tok], dim=1)
            return tok @ torch.from_numpy(W_PATCH) + torch.from_numpy(POS_EMB)

except ImportError:  # pragma: no cover
    pass


# ------------------------------------------------------------------- JAX ----

def embed_frames_jax(frames):
    """JAX twin of TinyImageEmbedder over (N, H, W, 3) channel-last frames."""
    import jax.numpy as jnp

    n, h, w, _ = frames.shape
    patches = frames.reshape(n, POOL, h // POOL, POOL, w // POOL, 3).mean((2, 4))
    patches = patches.reshape(n, POOL * POOL, 3)
    mean_tok = frames.mean(axis=(1, 2))[:, None, :]
    tok = jnp.concatenate([patches, mean_tok], axis=1)
    return tok @ jnp.asarray(W_PATCH) + jnp.asarray(POS_EMB)[None]
