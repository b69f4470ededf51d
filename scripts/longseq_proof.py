"""Long-sequence proof at KITTI/DAVIS scale (VERDICT r4 item 4).

The reference engineers explicitly for >=80-frame scenes
(scripts/evaluation/infer_geo4d.py:39 empty_cache cliff;
base_opt_group.py:611-622) and BASELINE configs include 100+ frame KITTI/
DAVIS videos — but the bench exercises only 32 frames / G=5 windows. This
script runs the REAL pipeline executables at G=25 windows / N=110 frames /
640x192 (KITTI eval resolution), where the aligner's (G, S, P) buffers are
~10x the bench size, and records timings + which compile buckets were hit
+ device memory, into LONGSEQ_r05.json at the repo root.

Zero weights (diffusion latency is shape-bound; the aligner gets synthetic
self-consistent geometry exactly like bench.py so init does real work).

Run on the TPU chip:  python scripts/longseq_proof.py [--frames 110]
"""

import argparse
import json
import logging
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from geo4d_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache(os.path.join(_REPO, ".jax_cache"))

H, W = 192, 640  # KITTI eval resolution (eval_dataset_geo4d.py:13-26)


def synth_predictions(groups, h, w, seed=0):
    """Self-consistent moving-camera geometry at (h, w) — same construction
    as bench.synth_predictions, parameterized by resolution."""
    import numpy as np

    G, S = groups.shape
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    f = 500.0
    n = int(groups.max()) + 1
    base = rng.uniform(2, 5, (h, w))
    depths = base[None] + rng.uniform(-0.1, 0.1, (n, h, w))
    shifts = np.cumsum(rng.uniform(-0.02, 0.02, (n, 3)), axis=0)
    pts_frames = np.stack([
        np.stack([(x - w / 2) / f * depths[i], (y - h / 2) / f * depths[i],
                  depths[i]], -1) + shifts[i]
        for i in range(n)
    ])
    preds = pts_frames[groups].astype(np.float32)
    conf = rng.uniform(0.3, 1.2, size=(G, S, h, w)).astype(np.float32)
    invd = (1.0 / depths[groups]).astype(np.float32)
    trajs = np.tile(np.eye(4, dtype=np.float32), (G, S, 1, 1))
    trajs[..., :3, 3] = -shifts[groups]
    return preds, conf, invd, trajs


def mem_stats():
    import jax

    try:
        s = jax.devices()[0].memory_stats() or {}
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in s}
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=110)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    import gc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_zero_params
    from geo4d_tpu.alignment.init import init_from_group
    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner
    from geo4d_tpu.data.video import sliding_windows
    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig, WindowPredictor

    n = args.frames
    groups = sliding_windows(n, 16, 4)
    G = groups.shape[0]
    print(f"# {n} frames @ {W}x{H} -> {G} windows", file=sys.stderr)

    model = GeoDiffusion()
    t0 = time.time()
    params = build_zero_params(model)
    print(f"# params ready ({time.time() - t0:.0f}s)", file=sys.stderr)

    icfg = InferenceConfig(window_batch=5, sky_eps=0.1)
    predictor = WindowPredictor(model, params, icfg)
    frames = np.random.default_rng(0).integers(
        0, 256, size=(n, H, W, 3), dtype=np.uint8
    )
    text_ctx = np.zeros((1, 77, 1024), np.float32)

    t0 = time.time()
    preds = predictor.predict_video(frames, groups, text_ctx, 10, seed=123,
                                    return_device=True)
    float(jnp.sum(preds["pts3d"]))
    diff_warm = time.time() - t0
    mem_diff = mem_stats()
    del preds
    t0 = time.time()
    preds = predictor.predict_video(
        np.random.default_rng(1).integers(0, 256, size=(n, H, W, 3),
                                          dtype=np.uint8),
        groups, text_ctx, 10, seed=124, return_device=True)
    float(jnp.sum(preds["pts3d"]))
    diff_s = time.time() - t0
    print(f"# diffusion {diff_s:.1f}s (warm {diff_warm:.0f}s), "
          f"mem {mem_diff}", file=sys.stderr)

    # free the 1.44B params + predictions before the aligner's big buffers
    del preds, predictor, params
    gc.collect()

    acfg = AlignerConfig(n_iter=500)   # default bucketing: Gp=28, Np=112

    def align_once(seed):
        """ctor + init + 500-iter run on fresh geometry; returns timings.

        The first call pays the phase-scan/ctor compiles at this bucket
        (r5 initial artifact conflated them into align_run_s: 100.8 s of
        which ~80 s was XLA compile); the second call is the steady state
        every later same-bucket sequence gets — same warm-then-time
        protocol as bench.py."""
        p, c, invd, trajs = synth_predictions(groups, H, W, seed=seed)
        S = groups.shape[1]
        # stage inputs on device BEFORE the timer (bench.py protocol): in
        # production these are the diffusion stage's device-resident
        # outputs; the ~1 GB host upload rides the 25-45 MB/s tunnel and
        # is not an alignment cost
        p_dev = jnp.asarray(p)
        pf = jnp.asarray(p.reshape(G, S, -1, 3))
        cf = jnp.asarray(c.reshape(G, S, -1))
        c_dev = jnp.asarray(c)
        iv = jnp.asarray(invd.reshape(G, S, -1))
        tj = jnp.asarray(trajs)
        jax.block_until_ready((p_dev, pf, cf, c_dev, iv, tj))
        float(jnp.sum(tj[0, 0]))   # tunnel sync (block_until_ready is async)
        t0 = time.time()
        al = GroupAligner(groups, pf, cf, (H, W), invdepth=iv, trajs=tj,
                          config=acfg)
        init_from_group(al, p_dev, c_dev)
        t_init = time.time() - t0
        al.run()
        total = time.time() - t0
        print(f"# align ctor+init {t_init:.1f}s, run {total - t_init:.1f}s",
              file=sys.stderr)
        return t_init, total - t_init, al.bucket_key()

    warm_init, warm_run, _ = align_once(0)
    t_init, run_s, bucket = align_once(1)
    align_s = t_init + run_s
    mem_align = mem_stats()
    print(f"# align steady: ctor+init {t_init:.1f}s, run {run_s:.1f}s "
          f"(cold: {warm_init:.1f}s + {warm_run:.1f}s), mem {mem_align}",
          file=sys.stderr)

    e2e = diff_s + align_s
    out = {
        "frames": n, "resolution": f"{W}x{H}", "windows": G,
        "bucket": {"Gp": bucket[0], "Np": bucket[1], "S": bucket[2],
                   "P": bucket[3]},
        "diffusion_s": round(diff_s, 2),
        "diffusion_warm_s": round(diff_warm, 1),
        "align_ctor_init_s": round(t_init, 2),
        "align_run_s": round(run_s, 2),
        "align_cold_ctor_init_s": round(warm_init, 2),
        "align_cold_run_s": round(warm_run, 2),
        "e2e_s": round(e2e, 2),
        "sec_per_frame": round(e2e / n, 3),
        "frames_per_sec": round(n / e2e, 3),
        "mem_after_diffusion": mem_diff,
        "mem_after_align": mem_align,
        "device": jax.devices()[0].device_kind,
        "note": ("zero weights; aligner on synthetic self-consistent "
                 "geometry (bench.py protocol: inputs staged on device "
                 "before the timer, warm-then-time) — proves no OOM and "
                 "steady-state timings at G=25/N=110, the reference's "
                 ">=80-frame engineering target; align_cold_* = first "
                 "in-process call (executable load from the disk cache)"),
    }
    path = os.path.join(_REPO, "LONGSEQ_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
