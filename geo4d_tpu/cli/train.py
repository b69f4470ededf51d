"""Training launcher (a capability the reference does NOT ship — its repo
has losses + batch builders in lvdm/models/ddpm3d.py but no pl.Trainer
invocation anywhere; SURVEY.md L0 note). This launcher wires the full
train loop: modality batch builder -> jitted dp-sharded train step ->
EMA -> orbax checkpoints -> JSONL metrics.

Data contract: a directory of .npz shards, each holding the raw modality
arrays per clip: video (T,H,W,3) [-1,1], normed_allpts / plucker_raymap /
plucker_cross (T,H,W,3), inverse_depth (T,H,W,1), fps (scalar) — i.e. the
output of the offline preprocessing (data/preprocess.py + the bbox2
normalizers in geometry/normalize.py).

Usage:
  python -m geo4d_tpu.cli.train --data_dir shards/ --out_dir runs/exp1 \
      [--ckpt_path base.ckpt] [--steps 10000] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import glob
import os


def get_parser():
    p = argparse.ArgumentParser(description="geo4d_tpu training")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--modality", type=str, default="pc_ray_cross_depth")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--uncond_prob", type=float, default=0.05)
    p.add_argument("--geometry_condition", action="store_true")
    p.add_argument("--fsdp", action="store_true",
                   help="shard large parameters + optimizer state over the "
                        "mesh 'data' axis (ZeRO-style; the reference trained "
                        "with DeepSpeed sharding, infer_geo4d.py:74-78)")
    p.add_argument("--fsdp_min_size", type=int, default=2**18,
                   help="smallest parameter (elements) worth sharding; "
                        "lower for tiny-model soak tests")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--resume", nargs="?", const="auto", default=None,
                   help="resume from a full-TrainState checkpoint "
                        "(default: <out_dir>/state_latest). Beyond the "
                        "reference, which ships no mid-run resume "
                        "(SURVEY §5)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true",
                   help="miniature model (presets.tiny) — smoke tests / "
                        "soak runs on CPU hosts")
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="mesh size (default: all devices)")
    p.add_argument("--mesh_platform", type=str, default=None,
                   help="mesh backend, e.g. 'cpu' for the virtual-device "
                        "soak (tests/test_train_soak.py)")
    p.add_argument(
        "--prompt",
        type=str,
        default="Output a video that assigns each 3D location in the world a consistent color.",
    )
    return p


def npz_stream(data_dir: str, batch_size: int, t: int,
               world_size: int = 1, rank: int = 0, start_epoch: int = 0,
               skip_batches: int = 0):
    """Endless stream of stacked clip batches from .npz shards with the
    reference's epoch-seeded, rank-sharded order (lvdm/data/
    batched_sampler.py:21-69 via geo4d_tpu.data.sampler.epoch_plan):
    every process derives the identical global plan from the epoch number
    alone and takes its batch-aligned slice — deterministic resume, no
    cross-process coordination."""
    import numpy as np

    from geo4d_tpu.data.sampler import epoch_plan, shard_plan

    files = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no .npz shards in {data_dir}")
    keys = ["video", "normed_allpts", "plucker_raymap", "plucker_cross",
            "inverse_depth"]
    epoch = start_epoch
    while True:
        plan = epoch_plan(len(files), batch_size, pool_size=1, epoch=epoch,
                          world_size=world_size)
        mine = shard_plan(plan, rank, world_size, batch_size)
        if skip_batches:
            # resume fast-forward: drop already-consumed rows of this
            # epoch's plan WITHOUT loading their files
            mine = mine[skip_batches * batch_size:]
            skip_batches = 0
        batch = {k: [] for k in keys + ["fps"]}
        for fi, _feat in mine:
            with np.load(files[fi]) as z:
                for k in keys:
                    batch[k].append(z[k][:t])
                batch["fps"].append(int(z.get("fps", 24)))
            if len(batch["fps"]) == batch_size:
                yield {
                    k: np.stack(v) if k != "fps" else np.asarray(v, np.int32)
                    for k, v in batch.items()
                }
                batch = {k: [] for k in keys + ["fps"]}
        epoch += 1


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from geo4d_tpu.cli.common import build_model_and_params, compute_text_context
    from geo4d_tpu.models.checkpoint import save_checkpoint
    from geo4d_tpu.parallel.mesh import make_mesh
    from geo4d_tpu.training.callbacks import EpochTimer, MetricLogger
    from geo4d_tpu.training.modalities import build_batch
    from geo4d_tpu.training.step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    if args.tiny:
        from geo4d_tpu.models import presets

        model = presets.tiny(temporal_length=args.video_length)
        params = presets.init_params(
            model, jax.random.PRNGKey(args.seed),
            (args.height, args.width), temporal_length=args.video_length,
            with_text=False,  # zero text ctx via compute_text_context fallback
        )
    else:
        model, params = build_model_and_params(
            args.ckpt_path, args.vae_path, (args.height, args.width), args.seed
        )
    prompt_emb = jnp.asarray(
        compute_text_context(model, params, args.prompt)
    )
    null_emb = jnp.asarray(compute_text_context(model, params, ""))

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        geometry_condition=args.geometry_condition,
        temporal_length=args.video_length,
    )
    state = create_train_state(params["unet"], cfg)
    frozen = {k: v for k, v in params.items() if k != "unet"}
    build = jax.jit(
        lambda p, b, k: build_batch(
            args.modality, model, p, b, k,
            jnp.broadcast_to(prompt_emb, (args.batch_size, *prompt_emb.shape[1:])),
            null_emb, args.uncond_prob, True,
        )
    )

    mesh = make_mesh(args.mesh_devices, platform=args.mesh_platform)
    batch_shard = NamedSharding(mesh, P("data")) if mesh.size > 1 else None

    raw_step = make_train_step(
        lambda p, *a: model.unet.apply(p, *a), model.schedule, cfg
    )
    if args.fsdp and mesh.size > 1:
        # ZeRO-style layout: params + EMA + Adam moments shard over 'data';
        # XLA inserts the all-gathers/reduce-scatters from the shardings.
        # The optimizer state mirrors the param tree per leaf, so the same
        # per-param spec applies wherever a leaf has a param's shape.
        from geo4d_tpu.parallel.mesh import shard_params_fsdp

        param_spec = shard_params_fsdp(mesh, state.params,
                                       min_size=args.fsdp_min_size)
        spec_by_shape = {
            p.shape: s
            for p, s in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(param_spec))
        }
        repl = NamedSharding(mesh, P())

        def put(leaf):
            return jax.device_put(
                leaf, spec_by_shape.get(getattr(leaf, "shape", None), repl)
            )

        state = jax.tree_util.tree_map(put, state)
        step_fn = jax.jit(raw_step, donate_argnums=(0,))
    else:
        step_fn = jax.jit(raw_step)

    # ---- resume: restore the FULL TrainState (params + EMA + Adam
    # moments + step) and fast-forward the deterministic epoch plan ----
    step0 = 0
    if args.resume is not None:
        from geo4d_tpu.models.checkpoint import restore_checkpoint

        resume_path = (
            os.path.join(args.out_dir, "state_latest")
            if args.resume == "auto" else args.resume
        )
        if os.path.exists(resume_path):
            state = restore_checkpoint(resume_path, state)
            step0 = int(np.asarray(state.step))
            print(f"[train] resumed at step {step0} from {resume_path}")
        else:
            print(f"[train] no checkpoint at {resume_path}; starting fresh")

    logger = MetricLogger(args.out_dir)
    timer = EpochTimer()
    timer.start()
    from geo4d_tpu.data.sampler import round_by

    n_shards = len(glob.glob(os.path.join(args.data_dir, "*.npz")))
    bpe = max(
        round_by(n_shards, args.batch_size * jax.process_count())
        // (args.batch_size * jax.process_count()), 1,
    )
    stream = npz_stream(
        args.data_dir, args.batch_size, args.video_length,
        world_size=jax.process_count(), rank=jax.process_index(),
        start_epoch=step0 // bpe, skip_batches=step0 % bpe,
    )
    # the per-step RNG stream is derived from the step index so a resumed
    # run draws the same keys the uninterrupted run would
    base_key = jax.random.PRNGKey(args.seed)

    for i in range(step0, args.steps):
        raw = next(stream)
        raw = {k: jnp.asarray(v) for k, v in raw.items()}
        if batch_shard is not None:
            raw = {k: jax.device_put(v, batch_shard) for k, v in raw.items()}
        k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
        batch = build(frozen, raw, k1)
        state, metrics = step_fn(state, batch, k2)
        timer.step(args.batch_size)
        logger.log(i, metrics)
        if (i + 1) % args.ckpt_every == 0:
            save_checkpoint(os.path.join(args.out_dir, f"ckpt_{i + 1:08d}"),
                            {"unet": state.ema_params})
            save_checkpoint(os.path.join(args.out_dir, "state_latest"), state)
    stats = timer.finish()
    logger.log(args.steps, stats)
    save_checkpoint(os.path.join(args.out_dir, "ckpt_final"),
                    {"unet": state.ema_params})
    print(f"[train] done: {stats}")


if __name__ == "__main__":
    main()
