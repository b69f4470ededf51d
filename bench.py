"""Benchmark: END-TO-END video->4D throughput on real hardware.

Measures the metric the reference's own harness reports — seconds/frame of
(window diffusion + group alignment), the `time_cost.txt` definition
(scripts/evaluation/infer_geo4d.py:437-463,503-511,640-648) — on a
32-frame video at Sintel eval resolution (576x256) with the full eval
preset: 5-step DDIM over the 1.44B-param UNet, 4-head geometry decode,
16-frame windows stride 4 (5 windows), group alignment with 500 iters +
iter-150 batched-lad2 calibration.

Two-stage protocol (no checkpoint download available in-bench):
  * diffusion stage: RANDOM-NORMAL params (r4's zero-param protocol is
    kept only as an A/B probe) — through the REAL
    WindowPredictor.predict_video path (deduped CLIP + VAE enc + DDIM +
    4-head decode + batched Plücker cameras), best-of-2 on fresh inputs.
  * alignment stage: synthetic self-consistent geometry (random depth
    unprojected through a known focal) — random-param diffusion output is
    near-degenerate and would short-circuit PnP/MoGe/gating,
    UNDER-counting init; the synthetic predictions exercise the real
    code path (63-candidate focal sweeps, sim3 registration, full
    calibration).
Each stage warms its jit caches once (compile time reported separately),
then is timed on fresh inputs (the axon tunnel value-caches repeated
executions). sec/frame = (t_diffusion + t_alignment) / frames.

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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Persistent compile cache lives IN THE REPO (gitignored): /tmp does not
# survive across driver rounds, but the repo checkout does — so the 1.44B-UNet
# compile (~400-900 s over the remote-device tunnel) is paid once in a build
# session and every later bench run (incl. the driver's, which has a hard
# timeout) deserializes instead of recompiling.  Must go through
# core.cache (jax.config.update), NOT env vars: the host's sitecustomize
# imports jax at interpreter startup, freezing env-derived config before
# this file runs.
from geo4d_tpu.core.cache import enable_persistent_compile_cache

CACHE_DIR = enable_persistent_compile_cache(os.path.join(_REPO, ".jax_cache"))

A100_E2E_FRAMES_PER_SEC = 0.81
H, W, T = 256, 576, 16
N_FRAMES = 32


def _param_shapes(model):
    """Shape tree of all towers' params, as {tower: [(path, shape, dtype)]}.

    The eval_shape traces of five flax `init` fns cost ~60 s of pure host
    work on the 1-vCPU bench host, identical every run — so the flattened
    shape list is cached on disk (keyed by the model config repr + jax
    version) next to the XLA compile cache."""
    import hashlib
    import jax
    import jax.numpy as jnp

    cache_dir = CACHE_DIR
    fingerprint = hashlib.md5(
        (repr(model) + jax.__version__ + f"{H}x{W}x{T}").encode()
    ).hexdigest()
    cache_path = os.path.join(cache_dir, f"bench_shapes_{fingerprint}.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)

    rng = jax.random.PRNGKey(0)
    towers = {
        "unet": lambda k: model.unet.init(
            k, jnp.zeros((1, T, H // 8, W // 8, 20), jnp.bfloat16),
            jnp.array([999]), jnp.zeros((1, 77 + T * 16, 1024), jnp.bfloat16),
            jnp.array([24]),
        ),
        "vae": lambda k: model.vae.init(k, jnp.zeros((1, H, W, 3))),
        "pointmap_vae": lambda k: model.pointmap_vae.init(
            k, jnp.zeros((1, H, W, 3)), method=model.pointmap_vae.init_all
        ),
        "clip_img": lambda k: model.image_encoder.init(
            k, jnp.zeros((1, 224, 224, 3))
        ),
        "resampler": lambda k: model.resampler.init(
            k, jnp.zeros((1, T, 257, 1280))
        ),
    }
    shapes = {}
    for name, fn in towers.items():
        tree = jax.eval_shape(fn, rng)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        shapes[name] = [
            (jax.tree_util.keystr(path), list(leaf.shape), str(leaf.dtype))
            for path, leaf in flat
        ]
    os.makedirs(cache_dir, exist_ok=True)
    with open(cache_path, "w") as f:
        json.dump(shapes, f)
    return shapes


def build_zero_params(model):
    """Zero-weight params for every tower, materialized in ONE device call.

    Per-leaf `jnp.zeros` + a separate bf16 cast cost ~2 tunnel round trips
    x ~2800 leaves (~3 min); a single jitted producer of the whole tree is
    one dispatch and its (trivial) compile hits the persistent cache."""
    import jax
    import jax.numpy as jnp

    shapes = _param_shapes(model)

    def rebuild(arrays):
        """Reassemble {tower: nested dict} from keystr paths like
        "['params']['down_0']['kernel']" (order matches `shapes`)."""
        params = {}
        for tower, entries in shapes.items():
            tree = {}
            for (path, _, _), value in zip(entries, arrays[tower]):
                keys = [p.strip("'\"") for p in
                        path.replace("]", "").split("[")[1:]]
                node = tree
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                node[keys[-1]] = value
            params[tower] = tree
        return params

    def make_all():
        return {
            tower: [
                jnp.zeros(shape, jnp.bfloat16
                          if jnp.issubdtype(jnp.dtype(dtype), jnp.floating)
                          else dtype)
                for _, shape, dtype in entries
            ]
            for tower, entries in shapes.items()
        }

    return rebuild(jax.jit(make_all)())


PEAK_BY_KIND = {
    # (dense bf16 TFLOP/s, HBM GB/s) per chip, keyed by device_kind substring
    "v5 lite": (197.0, 819.0), "v5litepod": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0), "v5p": (459.0, 2765.0),
    "v6 lite": (918.0, 1640.0), "v6e": (918.0, 1640.0),
    "v3": (123.0, 900.0), "v2": (45.0, 700.0),
}


def chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, (tflops, gbps) in PEAK_BY_KIND.items():
        if key in kind:
            return tflops, gbps, jax.devices()[0].device_kind
    return None, None, jax.devices()[0].device_kind


COSTS_PATH = os.path.join(_REPO, "bench_costs.json")


def _cached_cost_analysis(tag, lower_fn):
    """FLOPs (+ bytes) of a compiled executable via XLA cost analysis.

    The full-graph lowering costs 10+ min of 1-vCPU host time — far too
    slow to pay inside the driver's timed bench — and is DETERMINISTIC for
    fixed shapes/config, so the numbers live in the committed
    bench_costs.json, regenerated by `scripts/trace_bench_costs.py`
    (or GEO4D_BENCH_TRACE_COSTS=1) whenever shapes/model change. A stale
    tag (shape change without regeneration) simply misses and reports null
    MFU rather than lying."""
    costs = {}
    if os.path.exists(COSTS_PATH):
        with open(COSTS_PATH) as f:
            costs = json.load(f)
    if tag in costs:
        return costs[tag]
    if os.environ.get("GEO4D_BENCH_TRACE_COSTS") != "1":
        print(f"# cost tag {tag!r} not in {COSTS_PATH}; run "
              "scripts/trace_bench_costs.py to (re)generate", file=sys.stderr)
        return None
    cost = lower_fn().compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    costs[tag] = {
        "flops": float(cost.get("flops", 0.0)),
        "bytes": float(cost.get("bytes accessed", 0.0)),
    }
    with open(COSTS_PATH, "w") as f:
        json.dump(costs, f, indent=1, sort_keys=True)
    return costs[tag]


def substage_specs(model, params, icfg, groups):
    """The five diffusion substages as standalone jits with multipliers.

    Each lowered graph contains NO internal lax loop, so XLA cost analysis
    counts it exactly once, and `mult` scales it to the full stage. This
    replaced a whole-graph cost analysis of run_video: HloCostAnalysis
    counts `lax.scan`/`lax.map` BODIES ONCE, so the r4 artifact's
    185.65 TFLOP stage figure was a ~3x undercount (the 4-head decode
    alone is 92.2 TFLOP *per window*) and the 12.5% MFU it implied was an
    accounting artifact, not dead time.

    Returns [(name, mult, jit_fn, make_args)].
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geo4d_tpu.nn.clip import clip_preprocess

    G, T_ = groups.shape
    chunk = 16
    n_chunks = -(-N_FRAMES // chunk)
    hl, wl = H // 8, W // 8

    # base inputs uploaded ONCE; per-iteration args derive on DEVICE by a
    # tiny add (fresh values defeat the tunnel's value cache without a
    # 100-200 MB host upload riding the 25-45 MB/s link inside the timer)
    def base(seed, shape, scale=0.1):
        return jnp.asarray(
            np.random.default_rng(seed).normal(scale=scale, size=shape),
            jnp.float32,
        )

    b_clip = base(0, (chunk, H, W, 3))
    b_tok = base(10, (G, T_, 257, 1280))
    b_x = base(30, (G, T_, hl, wl, 16))
    b_cc = base(40, (G, T_, hl, wl, 4))
    b_ctx = base(50, (G, 77 + T_ * 16, 1024))
    b_s = base(60, (1, T_, hl, wl, 16))
    b_ray = base(70, (G, T_, H, W, 3))
    fs = jnp.full((G,), 24, jnp.int32)
    # one scalar fetch forces the uploads to complete before any timer
    float(jnp.sum(b_clip[0, 0, 0]) + jnp.sum(b_ray[0, 0, 0, 0]))

    clip_fn = jax.jit(lambda p, f: model.image_encoder.apply(
        p["clip_img"], clip_preprocess(f)))
    res_fn = jax.jit(lambda p, t: model.resample_tokens(p, t))
    enc_fn = jax.jit(lambda p, f: model.encode_first_stage(p, f[None], None))
    unet_fn = jax.jit(lambda p, x, c, ctx, f: model.apply_model(
        p, x, jnp.full((x.shape[0],), 500, jnp.int32), ctx, c, f))
    dec_fn = jax.jit(lambda p, s: model.decode_geometry(p, s))

    from geo4d_tpu.geometry.rays import cameras_from_plucker

    plk_fn = jax.jit(lambda r, m: jax.vmap(
        lambda rr, mm: cameras_from_plucker(rr, mm)[0])(r, m))

    return [
        ("clip", n_chunks, clip_fn,
         lambda i: (params, b_clip + i * 1e-3)),
        ("resampler", 1, res_fn,
         lambda i: (params, b_tok + i * 1e-3)),
        ("vae_encode", n_chunks, enc_fn,
         lambda i: (params, b_clip + 0.5 + i * 1e-3)),
        ("unet_step", icfg.ddim_steps, unet_fn,
         lambda i: (params, b_x + i * 1e-3, b_cc + i * 1e-3,
                    b_ctx + i * 1e-3, fs)),
        ("decode_window", G, dec_fn,
         lambda i: (params, b_s + i * 1e-3)),
        ("plucker", 1, plk_fn,
         lambda i: (b_ray + i * 1e-3, b_ray + 1.0 + i * 1e-3)),
    ]


def substage_report(model, params, icfg, groups):
    """Per-substage (seconds, TFLOP, MFU, GB/s) + exact stage totals.

    Timing: warm-up + best-of-2 on fresh inputs with a scalar-fetch sync.
    Costs: XLA cost analysis per substage (disk-cached), x mult.
    """
    import jax
    import jax.numpy as jnp

    peak, peak_gbps, _ = chip_peaks()
    report = {}
    total_flops = total_bytes = 0.0
    for name, mult, fn, make_args in substage_specs(model, params, icfg,
                                                    groups):
        tag = f"sub_{name}_{N_FRAMES}x{H}x{W}_wb{icfg.window_batch}"
        cost = _cached_cost_analysis(
            tag, lambda fn=fn, make_args=make_args: fn.lower(*make_args(0))
        )
        fn(*make_args(0))  # warm (compile or cache hit)
        best = float("inf")
        for i in (1, 2):
            args = make_args(i)
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]
                          .astype(jnp.float32)))
            best = min(best, time.time() - t0)
        entry = {"s": round(best * mult, 3), "mult": mult}
        if cost:
            flops = cost["flops"] * mult
            byts = cost["bytes"] * mult
            total_flops += flops
            total_bytes += byts
            entry["tflop"] = round(flops / 1e12, 2)
            if peak:
                entry["mfu"] = round(flops / (best * mult) / (peak * 1e12), 4)
            if peak_gbps:
                entry["gbps"] = round(byts / (best * mult) / 1e9, 1)
        report[name] = entry
    return report, total_flops, total_bytes


def build_random_params(model, scale=0.02):
    """Random-normal params at the exact zero-param shapes — used once per
    round to bound the 'latency is weight-value independent' protocol
    (VERDICT r3 weakness 5)."""
    import jax
    import jax.numpy as jnp

    shapes = _param_shapes(model)

    def make_all(key):
        out = {}
        for tower, entries in shapes.items():
            keys = jax.random.split(key, len(entries) + 1)
            key = keys[0]
            arrs = []
            for (_, shape, dtype), k in zip(entries, keys[1:]):
                if jnp.issubdtype(jnp.dtype(dtype), jnp.floating):
                    arrs.append(
                        jax.random.normal(k, shape, jnp.bfloat16) * scale
                    )
                else:
                    arrs.append(jnp.zeros(shape, dtype))
            out[tower] = arrs
        return out

    # reuse build_zero_params' rebuild-from-paths helper
    rebuilt = jax.jit(make_all)(jax.random.PRNGKey(7))

    def rebuild(arrays):
        params = {}
        for tower, entries in shapes.items():
            tree = {}
            for (path, _, _), value in zip(entries, arrays[tower]):
                keys = [p.strip("'\"") for p in
                        path.replace("]", "").split("[")[1:]]
                node = tree
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                node[keys[-1]] = value
            params[tower] = tree
        return params

    return rebuild(rebuilt)


def time_diffusion_stage(model, params, icfg):
    """Warm-up then timed predict_video on fresh frames — the production
    path reconstruct() takes: video uploaded once, windows gathered on
    device, outputs left device-resident for the aligner."""
    import jax
    import numpy as np

    from geo4d_tpu.data.video import sliding_windows
    from geo4d_tpu.pipeline.inference import WindowPredictor

    groups = sliding_windows(N_FRAMES, icfg.window, icfg.stride)
    text_ctx = np.zeros((1, 77, 1024), np.float32)

    def synth_frames(seed):
        # uint8 like the production ingest (data/video.py raw_uint8): the
        # video uploads 4x smaller and normalizes in-jit — the f32 upload
        # measured 1.3-2.4 s of the diffusion stage on the tunnel link
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(N_FRAMES, H, W, 3), dtype=np.uint8)

    import jax.numpy as jnp

    def checksum(preds):
        # the axon tunnel does not synchronize on block_until_ready; a
        # scalar fetch bounds true completion (one ~30 ms round trip)
        return float(jnp.sum(preds["pts3d"]) + jnp.sum(preds["conf"])
                     + jnp.sum(preds["inv_depth"]) + jnp.sum(preds["traj"]))

    predictor = WindowPredictor(model, params, icfg)
    t0 = time.time()
    preds = predictor.predict_video(synth_frames(0), groups, text_ctx, 24,
                                    seed=123, return_device=True)
    checksum(preds)
    warm_s = time.time() - t0

    best = float("inf")
    for seed in (1, 2):
        t0 = time.time()
        preds = predictor.predict_video(synth_frames(seed), groups, text_ctx,
                                        24, seed=123 + seed,
                                        return_device=True)
        checksum(preds)
        best = min(best, time.time() - t0)
    return best, warm_s, groups


def aligner_cost(al):
    """Cost analysis of one optimizer iteration (value_and_grad of the full
    alignment loss — the Adam update adds O(params) FLOPs, negligible next
    to the (G,S,P) loss tensors)."""
    import jax

    def lower():
        f = jax.jit(
            lambda p: jax.value_and_grad(lambda q: al.loss_fn(q, True))(p)
        )
        return f.lower(al.params)

    tag = f"align_iter_G{al.Gp}_N{al.Np}_P{al.P}"
    return _cached_cost_analysis(tag, lower)


def synth_predictions(groups, seed=0):
    """Self-consistent moving-camera geometry: random smooth depth
    unprojected at focal 500 with small per-frame translations — realistic
    work for MoGe focal recovery, the PnP focal sweep, sim3 registration
    and the lad2 calibration gates."""
    import numpy as np

    G, S = groups.shape
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(W), np.arange(H))
    f = 500.0
    n = int(groups.max()) + 1
    # per-frame depth: shared base + small per-frame variation
    base = rng.uniform(2, 5, (H, W))
    depths = base[None] + rng.uniform(-0.1, 0.1, (n, H, W))
    shifts = np.cumsum(rng.uniform(-0.02, 0.02, (n, 3)), axis=0)

    pts_frames = np.stack([
        np.stack([(x - W / 2) / f * depths[i], (y - H / 2) / f * depths[i],
                  depths[i]], -1) + shifts[i]
        for i in range(n)
    ])
    preds = pts_frames[groups].astype(np.float32)           # (G,S,H,W,3)
    conf = rng.uniform(0.3, 1.2, size=(G, S, H, W)).astype(np.float32)
    invd = (1.0 / depths[groups]).astype(np.float32)
    trajs = np.tile(np.eye(4, dtype=np.float32), (G, S, 1, 1))
    trajs[..., :3, 3] = -shifts[groups]
    return preds, conf, invd, trajs


def time_alignment_stage(groups, acfg):
    """Warm-up then timed (ctor + init_from_group + run) on fresh geometry.

    The predictions are staged ON DEVICE before the timer starts — in the
    production pipeline they are already resident there as the diffusion
    stage's outputs (reconstruct's device handoff), so the upload is part
    of the diffusion stage's fetch-free design, not an alignment cost."""
    import jax
    import jax.numpy as jnp

    from geo4d_tpu.alignment.init import init_from_group
    from geo4d_tpu.alignment.optimizer import GroupAligner

    def once(seed):
        preds, conf, invd, trajs = synth_predictions(groups, seed)
        G, S = groups.shape
        preds_dev = jnp.asarray(preds)
        conf_dev = jnp.asarray(conf)
        invd_dev = jnp.asarray(invd.reshape(G, S, -1))
        trajs_dev = jnp.asarray(trajs)
        jax.block_until_ready(preds_dev)
        t0 = time.time()
        al = GroupAligner(
            groups, preds_dev.reshape(G, S, -1, 3),
            conf_dev.reshape(G, S, -1), (H, W),
            invdepth=invd_dev, trajs=trajs_dev, config=acfg,
        )
        init_from_group(al, preds_dev, conf_dev)
        t_init = time.time() - t0
        al.run()
        total = time.time() - t0
        print(f"#   align breakdown: ctor+init {t_init:.1f}s, "
              f"run {total - t_init:.1f}s", file=sys.stderr)
        return total, total - t_init, al

    warm_s, _, al = once(0)
    # best-of-2: the tunnel to the remote chip is shared infrastructure
    # with high run-to-run variance; min is the honest steady-state
    t1, r1, _ = once(1)
    t2, r2, _ = once(2)
    return min(t1, t2), warm_s, min(r1, r2), al


def main():
    import gc

    import jax

    from geo4d_tpu.alignment.optimizer import AlignerConfig
    from geo4d_tpu.models.diffusion import GeoDiffusion
    from geo4d_tpu.pipeline.inference import InferenceConfig

    model = GeoDiffusion()
    # window_batch=5: all 5 windows in ONE device launch (UNet batch 80
    # frames; decode/encode chunk per-window in-jit via lax.map)
    icfg = InferenceConfig(window_batch=5, sky_eps=0.1)
    # bucket_groups=1: the bench shape is fixed at G=5 — the default
    # bucket of 4 would pad to Gp=8 and waste 37% of every loss iter
    acfg = AlignerConfig(n_iter=500, bucket_groups=1)

    # ---- HEADLINE protocol (VERDICT r4 item 2): the published stage time
    # uses RANDOM-NORMAL weights, best-of-2 — same protocol as every other
    # number. r4's "+17% with random params" was measurement asymmetry
    # (zero = min of 2 runs, random = a single run on a shared tunnel with
    # high variance), not value-dependent compute: a fixed-shape jitted
    # graph does the same FLOPs regardless of weight values on TPU.
    t0 = time.time()
    rparams = build_random_params(model)
    init_s = time.time() - t0
    print(f"# random params ready ({init_s:.0f}s), diffusion stage...",
          file=sys.stderr)

    diff_s, diff_warm, groups = time_diffusion_stage(model, rparams, icfg)
    print(f"# diffusion {diff_s:.1f}s (warm-up {diff_warm:.0f}s), "
          f"substage physics...", file=sys.stderr)

    # ---- per-substage seconds + MFU/GB/s (VERDICT r4 item 1): FLOPs from
    # XLA cost analysis of loop-free substage graphs x trip counts — the
    # whole-graph analysis undercounted lax.scan/map bodies ~3x.
    peak, peak_gbps, device_kind = chip_peaks()
    substages = None
    stage_flops = stage_bytes = None
    try:
        substages, stage_flops, stage_bytes = substage_report(
            model, rparams, icfg, groups
        )
        for name, e in substages.items():
            print(f"#   {name:14s} {e['s']:6.2f}s x{e['mult']}"
                  + (f"  {e.get('tflop', 0):7.2f} TF  "
                     f"{100 * e.get('mfu', 0):5.1f}% MFU  "
                     f"{e.get('gbps', 0):6.1f} GB/s"
                     if "tflop" in e else ""),
                  file=sys.stderr)
    except Exception as e:
        print(f"# substage report unavailable: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)

    diffusion_mfu = diff_gbps = None
    if stage_flops and peak:
        diffusion_mfu = stage_flops / diff_s / (peak * 1e12)
        diff_gbps = stage_bytes / diff_s / 1e9

    print("# alignment stage...", file=sys.stderr)
    del rparams        # free the 1.44B random params before the (G,S,P)
    gc.collect()       # aligner buffers land (HBM)
    align_s, align_warm, align_run_s, al = time_alignment_stage(groups, acfg)

    try:
        acost = aligner_cost(al)
    except Exception as e:  # cost analysis is diagnostics, never fatal
        print(f"# aligner cost analysis unavailable: {e!r}", file=sys.stderr)
        acost = None
    align_mfu = align_gbps = None
    if acost and peak and align_run_s > 0:
        align_mfu = acost["flops"] * acfg.n_iter / align_run_s / (peak * 1e12)
        align_gbps = acost["bytes"] * acfg.n_iter / align_run_s / 1e9

    # ---- zero-params A/B probe (LAST, after freeing the aligner): same
    # executable, zero weights, same best-of-2 protocol — bounds any
    # residual weight-value dependence. DIAGNOSTIC, never fatal.
    diff_zero_s = None
    try:
        del al
        gc.collect()
        # r5 run hit RESOURCE_EXHAUSTED here: device buffers pinned by
        # module-level caches (substage timing inputs, aligner scan
        # carries) survive gc. Nothing after this point reads any existing
        # device array — the probe rebuilds everything from host — so
        # purge the device arena outright before the 2.9 GB zero params.
        for _arr in jax.live_arrays():
            try:
                _arr.delete()
            except Exception:
                pass
        zparams = build_zero_params(model)
        diff_zero_s, _, _ = time_diffusion_stage(model, zparams, icfg)
        del zparams
        gc.collect()
        print(f"# zero-params diffusion {diff_zero_s:.1f}s vs random-params "
              f"{diff_s:.1f}s (delta {diff_s - diff_zero_s:+.1f}s)",
              file=sys.stderr)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"[:300]
        print(f"# zero-params probe unavailable: {msg}", file=sys.stderr)

    e2e_s = diff_s + align_s
    frames_per_sec = N_FRAMES / e2e_s
    result = {
        "metric": "e2e_video4d_frames_per_sec",
        "value": round(frames_per_sec, 3),
        "unit": ("frames/s e2e, RANDOM-NORMAL weights (32f @576x256: "
                 "5x[CLIP+VAE enc+5-step DDIM 1.44B UNet+4-head decode+"
                 "Plücker cams] + group align init+500 iters+calib, "
                 "time_cost.txt definition)"),
        "vs_baseline": round(frames_per_sec / A100_E2E_FRAMES_PER_SEC, 2),
        # the reference publishes no numbers (BASELINE.json published={});
        # the anchor is the first-principles A100 estimate derived in this
        # file's docstring, not a measurement — treat vs_baseline as ±30%
        "baseline_kind": "estimate",
        "baseline_frames_per_sec": A100_E2E_FRAMES_PER_SEC,
        "baseline_uncertainty": "+/-30% (no published reference numbers)",
        # measured-physics fields (None when cost analysis is unavailable).
        # Stage FLOPs = sum of loop-free substage graphs x trip counts
        # (whole-graph HloCostAnalysis counts scan/map bodies once — the
        # r4 figure of 185.65 TFLOP / 12.5% MFU was a ~3x undercount).
        "device_kind": device_kind,
        "chip_peak_bf16_tflops": peak,
        "diffusion_s": round(diff_s, 2),
        "diffusion_s_zero_params": (
            round(diff_zero_s, 2) if diff_zero_s is not None else None
        ),
        "diffusion_stage_tflop": (
            round(stage_flops / 1e12, 2) if stage_flops else None
        ),
        "diffusion_mfu": (
            round(diffusion_mfu, 4) if diffusion_mfu is not None else None
        ),
        "diffusion_substages": substages,
        "align_iter_gflop": (
            round(acost["flops"] / 1e9, 2) if acost else None
        ),
        "align_mfu": round(align_mfu, 4) if align_mfu is not None else None,
        # the aligner loop is MEMORY-bound (3.85 GB accessed / 7.5 GFLOP
        # per iter -> arithmetic intensity ~2 FLOP/byte, vs the ~240
        # needed to feed the MXU): achieved HBM bandwidth, not MFU, is
        # its speed-of-light measure
        "hbm_peak_gbps": peak_gbps,
        "diffusion_achieved_gbps": (
            round(diff_gbps, 1) if diff_gbps is not None else None
        ),
        "align_achieved_gbps": (
            round(align_gbps, 1) if align_gbps is not None else None
        ),
        "align_run_s": round(align_run_s, 2),
        "align_init_s": round(align_s - align_run_s, 2),
    }
    print(json.dumps(result))
    print(
        f"# e2e {e2e_s:.1f}s ({diff_s:.1f}s diffusion + {align_s:.1f}s align)"
        f" | warm-ups diff {diff_warm:.0f}s align {align_warm:.0f}s"
        f" | param init {init_s:.0f}s",
        file=sys.stderr,
    )
    if diffusion_mfu is not None:
        print(
            f"# physics: diffusion {100 * diffusion_mfu:.1f}% MFU "
            f"({stage_flops / 1e12:.0f} TFLOP / {diff_s:.1f}s) "
            f"@ {diff_gbps:.0f} GB/s; align run {align_gbps:.0f} GB/s "
            f"achieved HBM ({100 * align_gbps / peak_gbps:.0f}% of "
            f"{peak_gbps:.0f} peak; memory-bound, "
            f"{100 * align_mfu:.2f}% MFU) on {device_kind}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
