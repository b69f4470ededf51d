"""Benchmark: end-to-end per-window diffusion throughput on real hardware.

Measures the full per-window hot path at Sintel eval resolution (576x256,
16 frames): CLIP image embedding + resampler, VAE encode, 5-step DDIM over
the full 1.44B-param UNet (uniform_trailing, cfg 1.0 — the eval preset),
and the batched 4-head geometry decode, all as one jitted function.

Measurement notes: on the axon-tunneled TPU, block_until_ready does not
synchronize remote execution, so each timed run fetches a scalar checksum
of the outputs to host — that round-trip bounds the true completion time.
Params are zeros (eval_shape) — latency is weight-value independent.

Prints ONE JSON line. `vs_baseline`: the reference publishes no numbers
(BASELINE.json published={}), so the anchor is a first-principles A100
estimate of the reference's same per-window stage, pending a direct timing
of the reference harness on GPU hardware:
  UNet fwd = 11.2 TFLOP (measured via XLA cost analysis of the identical
  architecture); A100 fp16 ~312 TFLOP/s peak at ~30% utilization (typical
  torch eager SD-UNet) -> ~120 ms/step x 5 DDIM steps = 0.60 s
  + 4 heads x 16 frames per-frame VAE decode (--perframe_ae, the eval
    flag) ~15 ms/frame -> 0.96 s
  + CLIP ViT-H x16 + VAE encode x16 -> ~0.35 s
  => ~1.9 s/window = ~8.4 frames/s on A100.
BASELINE.md north star: >=3x that on a v5e-8 pod (this bench is 1 chip;
windows shard linearly across chips — parallel/mesh.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_EST_FRAMES_PER_SEC = 8.4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig, WindowPredictor

    H, W, T = 256, 576, 16
    model = GeoDiffusion()
    cfg = InferenceConfig(window_batch=1)

    t0 = time.time()

    def zeros_like_shapes(shapes):
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    rng = jax.random.PRNGKey(0)
    params = {}
    params["unet"] = zeros_like_shapes(jax.eval_shape(
        lambda k: model.unet.init(
            k, jnp.zeros((1, T, H // 8, W // 8, 20), jnp.bfloat16),
            jnp.array([999]), jnp.zeros((1, 77 + T * 16, 1024), jnp.bfloat16),
            jnp.array([24]),
        ), rng,
    ))
    params["vae"] = zeros_like_shapes(jax.eval_shape(
        lambda k: model.vae.init(k, jnp.zeros((1, H, W, 3))), rng,
    ))
    params["pointmap_vae"] = zeros_like_shapes(jax.eval_shape(
        lambda k: model.pointmap_vae.init(
            k, jnp.zeros((1, H, W, 3)), method=model.pointmap_vae.init_all
        ), rng,
    ))
    params["clip_img"] = zeros_like_shapes(jax.eval_shape(
        lambda k: model.image_encoder.init(k, jnp.zeros((1, 224, 224, 3))), rng,
    ))
    params["resampler"] = zeros_like_shapes(jax.eval_shape(
        lambda k: model.resampler.init(k, jnp.zeros((1, T, 257, 1280))), rng,
    ))
    from geo4d_tpu.core.dtypes import cast_floating

    params = cast_floating(params, jnp.bfloat16)
    init_s = time.time() - t0

    text_ctx = jnp.zeros((1, 77, 1024), jnp.float32)
    predictor = WindowPredictor(model, params, cfg)
    window_fn = predictor._window_fn()

    def run_with_checksum(params, frames, text_ctx, fs, key):
        out = window_fn(params, frames, text_ctx, text_ctx, fs, key)
        # checksum over every output forces full materialization
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                   if v.dtype != jnp.bool_)

    run = jax.jit(run_with_checksum)
    fs = jnp.full((1,), 24, jnp.int32)

    # distinct inputs per call (the tunnel caches repeated executions)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    frames_list = [
        jax.random.normal(k, (1, T, H, W, 3), jnp.float32) * 0.1 for k in keys
    ]
    jax.block_until_ready(frames_list)

    t0 = time.time()
    _ = float(run(params, frames_list[0], text_ctx, fs, keys[0]))  # compile
    compile_s = time.time() - t0

    n_runs = 5
    t0 = time.time()
    for i in range(1, n_runs + 1):
        _ = float(run(params, frames_list[i], text_ctx, fs, keys[i]))
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
