"""Capture + summarize a per-op TPU trace of the UNet bench substage.

Traces one warm `apply_model` call at the bench shapes (G=5 windows, T=16,
latent 32x72, 20ch) via jax.profiler, then parses the Chrome trace
(pid 3 = TPU device; `args.bytes_accessed` per event) and prints the top
device ops by total duration, grouped by fusion/op kind, so the UNet's
36.8%-MFU gap can be attributed to specific layers.

Usage:  python scripts/trace_unet.py [--outdir /tmp/unet_trace] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from geo4d_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache(os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def capture(outdir):
    from bench import H, W, T, build_zero_params
    from geo4d_tpu.models.diffusion import GeoDiffusion

    model = GeoDiffusion()
    t0 = time.time()
    params = build_zero_params(model)
    print(f"# params ready ({time.time() - t0:.0f}s)", file=sys.stderr)

    G = 5
    hl, wl = H // 8, W // 8
    rng = np.random.default_rng(0)

    def dev(shape):
        return jnp.asarray(rng.normal(scale=0.1, size=shape), jnp.float32)

    x = dev((G, T, hl, wl, 16))
    cc = dev((G, T, hl, wl, 4))
    ctx = dev((G, 77 + T * 16, 1024))
    fs = jnp.full((G,), 24, jnp.int32)

    unet_fn = jax.jit(lambda p, x, c, ctx, f: model.apply_model(
        p, x, jnp.full((x.shape[0],), 500, jnp.int32), ctx, c, f))

    # warm (compile-cache hit) + sync
    out = unet_fn(params, x, cc, ctx, fs)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.time()
    out = unet_fn(params, x + 1e-3, cc, ctx, fs)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    print(f"# warm fwd {time.time() - t0 :.3f}s", file=sys.stderr)

    jax.profiler.start_trace(outdir)
    out = unet_fn(params, x + 2e-3, cc + 1e-3, ctx, fs)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    jax.profiler.stop_trace()


def summarize(outdir, top):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device pids: process_name metadata mentioning TPU / device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    if not dev_pids:
        dev_pids = {3}

    per_op = collections.Counter()
    per_op_bytes = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name in ("RunExecutable", "Infeed", "Outfeed"):
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        total += dur
        per_op[name] += dur
        per_op_n[name] += 1
        args = e.get("args", {})
        try:
            per_op_bytes[name] += float(args.get("bytes_accessed", 0))
        except (TypeError, ValueError):
            pass

    print(f"# trace: {path}")
    print(f"# device-op total: {total:.4f}s over {sum(per_op_n.values())} events")
    print(f"{'op':64s} {'total_ms':>9s} {'n':>5s} {'GB/s':>8s} {'%':>6s}")
    for name, dur in per_op.most_common(top):
        gbps = per_op_bytes[name] / dur / 1e9 if dur else 0.0
        print(f"{name[:64]:64s} {dur * 1e3:9.2f} {per_op_n[name]:5d} "
              f"{gbps:8.1f} {100 * dur / total:6.2f}")

    # category rollup
    cats = collections.Counter()
    for name, dur in per_op.items():
        if "fusion" in name:
            cat = "fusion"
        elif "conv" in name or "Conv" in name:
            cat = "convolution"
        elif "dot" in name or "einsum" in name:
            cat = "dot"
        elif "custom" in name or "pallas" in name or "flash" in name:
            cat = "custom-call(pallas)"
        elif "copy" in name or "transpose" in name or "reshape" in name:
            cat = "copy/transpose"
        elif "all-" in name or "reduce-scatter" in name:
            cat = "collective"
        else:
            cat = "other"
        cats[cat] += dur
    print("\n# rollup")
    for cat, dur in cats.most_common():
        print(f"{cat:24s} {dur * 1e3:9.2f} ms  {100 * dur / total:5.1f}%")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/unet_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.outdir)
    summarize(args.outdir, args.top)
