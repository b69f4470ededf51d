"""Regenerate bench_costs.json: XLA cost analysis of the exact executables
bench.py times (diffusion run_video launch + one aligner iteration).

Run whenever bench shapes or the model architecture change:
    python scripts/trace_bench_costs.py
The full-graph trace takes 10-20 min of 1-vCPU host time — which is exactly
why the result is committed instead of recomputed inside the timed bench
(bench.py _cached_cost_analysis)."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["GEO4D_BENCH_TRACE_COSTS"] = "1"

import bench  # noqa: E402


def main():
    import jax

    from geo4d_tpu.alignment.init import init_from_group
    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner
    from geo4d_tpu.data.video import sliding_windows
    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig

    model = GeoDiffusion()
    icfg = InferenceConfig(window_batch=5, sky_eps=0.1)
    acfg = AlignerConfig(n_iter=500, bucket_groups=1)
    groups = sliding_windows(bench.N_FRAMES, icfg.window, icfg.stride)

    t0 = time.time()
    params = bench.build_zero_params(model)
    print(f"params {time.time() - t0:.0f}s; tracing substage costs...")

    total = 0.0
    for name, mult, fn, make_args in bench.substage_specs(
        model, params, icfg, groups
    ):
        t0 = time.time()
        tag = (f"sub_{name}_{bench.N_FRAMES}x{bench.H}x{bench.W}"
               f"_wb{icfg.window_batch}")
        cost = bench._cached_cost_analysis(
            tag, lambda fn=fn, make_args=make_args: fn.lower(*make_args(0))
        )
        total += cost["flops"] * mult
        print(f"  {name:14s} x{mult}: {cost['flops'] / 1e12:.2f} TFLOP, "
              f"{cost['bytes'] / 1e9:.1f} GB ({time.time() - t0:.0f}s)")
    print(f"diffusion stage total: {total / 1e12:.1f} TFLOP")

    import jax.numpy as jnp

    preds, conf, invd, trajs = bench.synth_predictions(groups, 0)
    G, S = groups.shape
    al = GroupAligner(
        groups, jnp.asarray(preds).reshape(G, S, -1, 3),
        jnp.asarray(conf).reshape(G, S, -1), (bench.H, bench.W),
        invdepth=jnp.asarray(invd.reshape(G, S, -1)),
        trajs=jnp.asarray(trajs), config=acfg,
    )
    init_from_group(al, jnp.asarray(preds), jnp.asarray(conf))
    t0 = time.time()
    a = bench.aligner_cost(al)
    print(f"aligner iter: {a['flops'] / 1e9:.2f} GFLOP, "
          f"{a['bytes'] / 1e9:.2f} GB accessed ({time.time() - t0:.0f}s)")
    print(f"wrote {bench.COSTS_PATH}")


if __name__ == "__main__":
    main()
