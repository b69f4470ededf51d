"""Per-stage device timing of the e2e pipeline at the bench shapes.

Times each compute stage of the diffusion window path and the aligner
separately (warm-up, then best-of-2 on fresh inputs with a scalar-checksum
fetch — `block_until_ready` does not synchronize over the axon tunnel).
Run:  python scripts/profile_stages.py [--stages diffusion,align]
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

import bench as bench_mod
from bench import H, W, T, N_FRAMES, build_zero_params, synth_predictions

G = 5  # sliding_windows(32, 16, 4)


def timed(name, fn, make_args, n=2):
    """Warm-up + best-of-n with fresh args; scalar fetch to synchronize."""
    args = make_args(0)
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    warm = time.time() - t0
    best = float("inf")
    for i in range(1, n + 1):
        args = make_args(i)
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3:9.1f} ms   (warm-up {warm:.1f}s)")
    return best


def profile_diffusion(model, params):
    frames_np = [
        np.random.default_rng(i).normal(
            scale=0.1, size=(G, T, H, W, 3)
        ).astype(np.float32)
        for i in range(4)
    ]
    frames = [jnp.asarray(f) for f in frames_np]
    jax.block_until_ready(frames)

    embed = jax.jit(lambda p, f: model.embed_frames(p, f))
    timed("CLIP embed+resampler (80f)", embed,
          lambda i: (params, frames[i]))

    enc = jax.jit(lambda p, f, k: model.encode_first_stage_chunked(
        p, f, jax.random.PRNGKey(k)))
    timed("VAE encode (80f chunked)", enc,
          lambda i: (params, frames[i], i))

    # DDIM: need ctx + z_video
    ctx = jnp.zeros((G, 77 + T * 16, 1024), jnp.float32)
    z_video = jnp.zeros((G, T, H // 8, W // 8, 4), jnp.float32)
    fs = jnp.full((G,), 24, jnp.int32)

    samp = jax.jit(lambda p, k, c, z: model.sample_window(
        p, jax.random.PRNGKey(k), c, z, fs, num_steps=5,
        timestep_spacing="uniform_trailing", eta=0.0,
        cfg_scale=1.0, guidance_rescale=0.7))
    t = timed("DDIM 5-step (5-win batch)", samp,
              lambda i: (params, i, ctx + i * 1e-3, z_video + i * 1e-3))
    print(f"{'  -> per UNet step':34s} {t/5*1e3:9.1f} ms")

    samples = jnp.zeros((G, T, H // 8, W // 8, 16), jnp.float32)
    dec = jax.jit(lambda p, s: model.decode_geometry(p, s))
    timed("4-head geometry decode", dec,
          lambda i: (params, samples + i * 1e-3))

    from geo4d_tpu.geometry.rays import cameras_from_plucker

    ray = jnp.zeros((G, T, H, W, 3), jnp.float32)
    cams = jax.jit(lambda r, m: jax.vmap(
        lambda rr, mm: cameras_from_plucker(rr, mm)[0])(r, m))
    timed("Plücker cameras (5 win)", cams,
          lambda i: (ray + i * 1e-3, ray + 1.0 + i * 1e-3))


def profile_align(groups):
    from geo4d_tpu.alignment.init import init_from_group
    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner

    acfg = AlignerConfig(n_iter=500, bucket_groups=1)

    def build(seed):
        preds, conf, invd, trajs = synth_predictions(groups, seed)
        Gn, S = groups.shape
        al = GroupAligner(
            groups, jnp.asarray(preds.reshape(Gn, S, -1, 3)),
            jnp.asarray(conf.reshape(Gn, S, -1)), (H, W),
            invdepth=jnp.asarray(invd.reshape(Gn, S, -1)),
            trajs=jnp.asarray(trajs), config=acfg,
        )
        init_from_group(al, jnp.asarray(preds), jnp.asarray(conf))
        return al

    al = build(0)

    # loss-only fwd (single iter cost floor) and value_and_grad
    consts = al._consts()
    loss = jax.jit(lambda p: al.loss_fn(p, True))
    timed("aligner loss fwd", loss, lambda i: (
        jax.tree_util.tree_map(lambda x: x + i * 1e-6, al.params),))
    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda q: al.loss_fn(q, True))(p))
    timed("aligner loss fwd+bwd", vg, lambda i: (
        jax.tree_util.tree_map(lambda x: x + i * 1e-6, al.params),))

    # full run (500 iters + calibrate) on fresh aligners
    als = [build(s) for s in (1, 2)]
    t0 = time.time()
    al.run()
    warm = time.time() - t0
    best = float("inf")
    for a in als:
        t0 = time.time()
        a.run()
        best = min(best, time.time() - t0)
    print(f"{'aligner.run (500it+calib)':34s} {best*1e3:9.1f} ms   "
          f"(warm-up {warm:.1f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="diffusion,align")
    args = ap.parse_args()

    from geo4d_tpu.data.video import sliding_windows
    from geo4d_tpu.models.diffusion import GeoDiffusion

    model = GeoDiffusion()
    t0 = time.time()
    params = build_zero_params(model)
    print(f"# params ready ({time.time()-t0:.0f}s)", file=sys.stderr)
    groups = sliding_windows(N_FRAMES, 16, 4)

    if "diffusion" in args.stages:
        profile_diffusion(model, params)
    if "align" in args.stages:
        profile_align(groups)


if __name__ == "__main__":
    main()
