"""Benchmark: end-to-end per-window diffusion throughput on real hardware.

Measures the full per-window hot path at Sintel eval resolution (576x256,
16 frames): CLIP image embedding + resampler, VAE encode, 5-step DDIM over
the full 1.44B-param UNet (uniform_trailing, cfg 1.0 — the eval preset),
and the batched 4-head geometry decode, all as one jitted function.

Prints ONE JSON line: frames/sec for the diffusion stage.
`vs_baseline`: the reference publishes no numbers (BASELINE.json
published={}); we report the ratio against a conservative measured-class
A100 estimate of the same stage (see BASELINE.md north star: >=3x A100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# A100 reference estimate for the same per-window stage (16 frames,
# 576x256, 5-step DDIM + CLIP + VAE enc/dec x4 heads, fp16 torch):
# ~0.55 windows/s -> ~35 frames/s of window-throughput class. This anchors
# vs_baseline until the reference harness is timed directly.
A100_EST_FRAMES_PER_SEC = 35.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig, WindowPredictor

    H, W, T = 256, 576, 16
    model = GeoDiffusion()
    cfg = InferenceConfig(window_batch=1)

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 8)

    frames = jnp.zeros((1, T, H, W, 3), jnp.float32)
    flat = frames.reshape(T, H, W, 3)

    def init_params():
        p = {}
        p["unet"] = jax.jit(
            lambda k: model.unet.init(
                k,
                jnp.zeros((1, T, H // 8, W // 8, 20), jnp.bfloat16),
                jnp.array([999]),
                jnp.zeros((1, 77 + T * 16, 1024), jnp.bfloat16),
                jnp.array([24]),
            )
        )(keys[0])
        p["vae"] = jax.jit(
            lambda k: model.vae.init(k, jnp.zeros((1, H, W, 3)))
        )(keys[1])
        p["pointmap_vae"] = jax.jit(
            lambda k: model.pointmap_vae.init(
                k, jnp.zeros((1, H, W, 3)), method=model.pointmap_vae.init_all
            )
        )(keys[2])
        p["clip_img"] = jax.jit(
            lambda k: model.image_encoder.init(k, jnp.zeros((1, 224, 224, 3)))
        )(keys[3])
        p["resampler"] = jax.jit(
            lambda k: model.resampler.init(
                k, jnp.zeros((1, T, 257, 1280))
            )
        )(keys[4])
        return p

    t0 = time.time()
    params = init_params()
    init_s = time.time() - t0

    text_ctx = jnp.zeros((1, 77, 1024), jnp.float32)
    predictor = WindowPredictor(model, params, cfg)
    run = jax.jit(predictor._window_fn())

    fs = jnp.full((1,), 24, jnp.int32)

    # compile + warmup
    t0 = time.time()
    out = run(params, frames, text_ctx, fs, keys[5])
    jax.block_until_ready(out["pts3d"])
    compile_s = time.time() - t0

    # timed runs
    n_runs = 5
    t0 = time.time()
    for i in range(n_runs):
        out = run(params, frames, text_ctx, fs, keys[5 + (i % 3)])
    jax.block_until_ready(out["pts3d"])
    per_window = (time.time() - t0) / n_runs

    frames_per_sec = T / per_window
    result = {
        "metric": "window_diffusion_frames_per_sec",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s (16f window @576x256: CLIP+VAE enc+5-step DDIM 1.44B UNet+4-head decode)",
        "vs_baseline": round(frames_per_sec / A100_EST_FRAMES_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# per-window {per_window*1000:.0f} ms | compile {compile_s:.0f}s | "
        f"init {init_s:.0f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
