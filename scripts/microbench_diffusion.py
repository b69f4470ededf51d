"""Microbenchmark the diffusion stage's components on the real chip.

Calibrates the chip (big matmul + big conv), then times each substage jit
and reports XLA cost-analysis FLOPs/bytes next to wall time so every line
has its own physics (MFU / achieved GB/s). Used to find where the 7.5 s
diffusion stage's dead time lives (VERDICT r5 item 1).

Run:  python scripts/microbench_diffusion.py [--parts calib,unet,decode]
"""

import argparse
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

from bench import H, W, T, N_FRAMES, build_zero_params, chip_peaks

G = 5
PEAK, PEAK_GBPS, KIND = chip_peaks()


def cost_of(lowered):
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def bench(name, fn, *args, n=2, flops=None, bts=None):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    warm = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    extra = ""
    if flops is not None:
        tfs = flops / best / 1e12
        extra += f"  {flops/1e12:7.2f} TF  {tfs:6.1f} TF/s ({100*tfs/PEAK:4.1f}%)"
    if bts is not None:
        extra += f"  {bts/best/1e9:6.1f} GB/s"
    print(f"{name:42s} {best*1e3:9.1f} ms{extra}   (warm {warm:.0f}s)")
    return best


def calib():
    print("== calibration ==")
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (8192, 8192), jnp.bfloat16)
    b = jax.random.normal(k, (8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    fl, by = cost_of(mm.lower(a, b))
    bench("matmul 8k^3 bf16", mm, a, b, flops=fl, bts=by)

    x = jax.random.normal(k, (64, 144, 64, 512), jnp.bfloat16)
    wgt = jax.random.normal(k, (3, 3, 512, 512), jnp.bfloat16) * 0.02
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16))
    fl, by = cost_of(conv.lower(x, wgt))
    bench("conv3x3 (64,144,64,512)->512 bf16", conv, x, wgt, flops=fl, bts=by)

    x2 = jax.random.normal(k, (64, 576, 256, 128), jnp.bfloat16)
    w2 = jax.random.normal(k, (3, 3, 128, 128), jnp.bfloat16) * 0.02
    fl, by = cost_of(conv.lower(x2, w2))
    bench("conv3x3 (64,576,256,128)->128 bf16", conv, x2, w2, flops=fl, bts=by)

    # f32 GroupNorm pass at a full-res decoder tensor: pure HBM traffic
    from geo4d_tpu.nn.basics import GroupNorm32
    gn = GroupNorm32()
    gp = gn.init(k, x2)
    gfn = jax.jit(lambda p, x: gn.apply(p, x))
    fl, by = cost_of(gfn.lower(gp, x2))
    bench("GroupNorm32 (64,576,256,128)", gfn, gp, x2, flops=fl, bts=by)


def unet_parts(model, params):
    print("== UNet ablations (one step, 5-window batch = 80 frames) ==")
    from geo4d_tpu.models.unet3d import UNet3D

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (G, T, H // 8, W // 8, 20), jnp.bfloat16) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (G, 77 + T * 16, 1024), jnp.bfloat16) * 0.1
    ts = jnp.full((G,), 999, jnp.int32)
    fs = jnp.full((G,), 24, jnp.int32)

    up = params["unet"]
    full = jax.jit(lambda p, x, c: model.unet.apply(p, x, ts, c, fs))
    fl, by = cost_of(full.lower(up, x, ctx))
    t_full = bench("UNet full", full, up, x, ctx, flops=fl, bts=by)

    # ablations: fresh zero params per variant (init via eval_shape + zeros)
    def variant(name, **kw):
        net = UNet3D(**kw)
        shapes = jax.eval_shape(
            lambda k: net.init(k, x, ts, ctx, fs), jax.random.PRNGKey(0))
        vp = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
        f = jax.jit(lambda p, x, c: net.apply(p, x, ts, c, fs))
        fl, by = cost_of(f.lower(vp, x, ctx))
        tt = bench(name, f, vp, x, ctx, flops=fl, bts=by)
        return tt

    t_nota = variant("UNet no temporal attn", temporal_attention=False,
                     addition_attention=False)
    t_notc = variant("UNet no temporal conv", temporal_conv=False)
    t_noattn = variant("UNet no attention at all",
                       attention_resolutions=(), temporal_attention=False,
                       addition_attention=False)
    print(f"  -> temporal attn cost {1e3*(t_full-t_nota):.0f} ms, "
          f"temporal conv cost {1e3*(t_full-t_notc):.0f} ms, "
          f"all-attention cost {1e3*(t_full-t_noattn):.0f} ms")


def decode_parts(model, params):
    print("== decode ablations ==")
    samples = jax.random.normal(jax.random.PRNGKey(3),
                                (G, T, H // 8, W // 8, 16), jnp.float32) * 0.1

    dec = jax.jit(lambda p, s: model.decode_geometry(p, s))
    fl, by = cost_of(dec.lower(params, samples))
    bench("decode_geometry (lax.map over 5 win)", dec, params, samples,
          flops=fl, bts=by)

    # single window (what lax.map serializes 5x)
    s1 = samples[:1]
    dec1 = jax.jit(lambda p, s: model.decode_geometry(p, s))
    fl1, by1 = cost_of(dec1.lower(params, s1))
    bench("decode_geometry (1 window)", dec1, params, s1, flops=fl1, bts=by1)

    # RGB-VAE decode of 48 frames (the rgb3 batch inside one window)
    z48 = jax.random.normal(jax.random.PRNGKey(4),
                            (1, 48, H // 8, W // 8, 4), jnp.float32) * 0.1
    d48 = jax.jit(lambda p, z: model.decode_first_stage(p, z))
    fl2, by2 = cost_of(d48.lower(params, z48))
    bench("RGB VAE decode 48 frames", d48, params, z48, flops=fl2, bts=by2)

    # pointmap-VAE conf decode of 16 frames
    z16 = jax.random.normal(jax.random.PRNGKey(5),
                            (1, 16, H // 8, W // 8, 4), jnp.float32) * 0.1
    d16 = jax.jit(lambda p, z: model.decode_pointmap_conf(p, z))
    fl3, by3 = cost_of(d16.lower(params, z16))
    bench("pointmap VAE conf decode 16 frames", d16, params, z16,
          flops=fl3, bts=by3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="calib,unet,decode")
    args = ap.parse_args()
    print(f"# chip {KIND}: peak {PEAK} TF/s bf16, {PEAK_GBPS} GB/s HBM")

    parts = args.parts.split(",")
    if "calib" in parts:
        calib()
    if "unet" in parts or "decode" in parts:
        from geo4d_tpu.models.diffusion import GeoDiffusion

        model = GeoDiffusion()
        t0 = time.time()
        params = build_zero_params(model)
        print(f"# params ready ({time.time()-t0:.0f}s)")
        if "unet" in parts:
            unet_parts(model, params)
        if "decode" in parts:
            decode_parts(model, params)


if __name__ == "__main__":
    main()
