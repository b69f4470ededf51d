"""Benchmark: END-TO-END video->4D throughput on real hardware.

Measures the metric the reference's own harness reports — seconds/frame of
(window diffusion + group alignment), the `time_cost.txt` definition
(scripts/evaluation/infer_geo4d.py:437-463,503-511,640-648) — on a
32-frame synthetic video at Sintel eval resolution (576x256) with the
full eval preset: 5-step DDIM over the 1.44B-param UNet, 4-head geometry
decode, 16-frame windows stride 4 (5 windows), group alignment with 500
iters + iter-150 batched-lad2 calibration.

Steady-state protocol: the pipeline runs once to populate jit caches
(compile time reported separately), then the timed run uses fresh window
RNG inputs (the axon tunnel caches repeated executions by value). Params
are zeros (eval_shape) — latency is weight-value independent; degenerate
predictions make host PnP fall back to identity, which is the cheap path,
so init-time is if anything UNDER-counted for us, not over.

Prints ONE JSON line. `vs_baseline`: the reference publishes no numbers
(BASELINE.json published={}), so the anchor is a first-principles A100
estimate of the same e2e stage, pending a direct timing of the reference
harness on GPU hardware:
  diffusion: UNet fwd = 11.2 TFLOP (XLA cost analysis of the identical
    architecture); A100 fp16 ~312 TFLOP/s at ~30% eager-torch utilization
    -> ~120 ms/step x 5 steps + perframe 4-head VAE decode (~0.96 s) +
    CLIP ViT-H x16 + VAE enc (~0.35 s) => ~1.9 s/window x 5 windows = 9.5 s
  alignment (reference runs it eagerly on GPU, base_opt_group.py:553-608):
    500 iters x ~25 ms/iter eager fwd+bwd over (G,S,P) tensors = 12.5 s
    + iter-150 lad2 calibration: 3 lrs x 3000 Adam steps x 5 groups,
      sequential eager (optimizer_group.py:345-366) ~ 0.9 ms/step = 13.5 s
    + host init (scipy-LM focal per window + PnP per frame + sim3) ~ 4 s
    => ~30 s
  e2e: 32 frames / 39.5 s = 0.81 frames/s on A100.
BASELINE.md north star: >=3x that. This bench runs on ONE chip; windows
shard linearly across a mesh (parallel/mesh.py) for the pod-level number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

A100_E2E_FRAMES_PER_SEC = 0.81


def build_zero_params(model, H, W, T):
    import jax
    import jax.numpy as jnp

    from geo4d_tpu.core.dtypes import cast_floating

    def zeros_like_shapes(shapes):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )

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
    return cast_floating(params, jnp.bfloat16)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geo4d_tpu.alignment.optimizer import AlignerConfig
    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig, reconstruct

    H, W, T = 256, 576, 16
    N_FRAMES = 32
    model = GeoDiffusion()

    t0 = time.time()
    params = build_zero_params(model, H, W, T)
    init_s = time.time() - t0

    text_ctx = np.zeros((1, 77, 1024), np.float32)
    icfg = InferenceConfig(window_batch=1, sky_eps=0.1)
    acfg = AlignerConfig(n_iter=500)

    def synth_frames(seed):
        rng = np.random.default_rng(seed)
        return (rng.normal(scale=0.1, size=(N_FRAMES, H, W, 3))
                .astype(np.float32))

    print(f"# params ready ({init_s:.0f}s), warm-up run...", file=sys.stderr)
    # warm-up: populates jit caches for the window fn + both aligner phases
    t0 = time.time()
    _, _, t_warm = reconstruct(model, params, synth_frames(0), text_ctx, fps=24,
                               inference_config=icfg, aligner_config=acfg,
                               seed=123)
    compile_s = time.time() - t0
    print(f"# warm-up {compile_s:.0f}s (diff {t_warm['diffusion_s']:.0f}s "
          f"align {t_warm['alignment_s']:.0f}s), timed run...", file=sys.stderr)

    # timed run on fresh inputs
    t0 = time.time()
    _, _, timing = reconstruct(model, params, synth_frames(1), text_ctx,
                               fps=24, inference_config=icfg,
                               aligner_config=acfg, seed=124)
    e2e_s = time.time() - t0

    frames_per_sec = N_FRAMES / e2e_s
    result = {
        "metric": "e2e_video4d_frames_per_sec",
        "value": round(frames_per_sec, 3),
        "unit": ("frames/s e2e (32f @576x256: 5x[CLIP+VAE enc+5-step DDIM "
                 "1.44B UNet+4-head decode] + group align 500 iters, "
                 "time_cost.txt definition)"),
        "vs_baseline": round(frames_per_sec / A100_E2E_FRAMES_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# e2e {e2e_s:.1f}s ({timing['diffusion_s']:.1f}s diffusion + "
        f"{timing['alignment_s']:.1f}s align) | warmup(compile) {compile_s:.0f}s | "
        f"init {init_s:.0f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
