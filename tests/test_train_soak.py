"""Train-launcher soak on the virtual CPU mesh (VERDICT.md round-4 item 10).

Promotes the multichip dryrun from "compiles and steps once" to "trains and
resumes": `cli/train.py` runs 20 REAL steps (tiny model, synthetic npz
shards, 8-device CPU mesh, --fsdp) in one uninterrupted run A and as an
interrupted run B (10 steps, process-style restart via main() re-entry,
--resume from state_latest, 10 more steps). Loss history and the final EMA
weights must match exactly — the epoch plan, the per-step fold_in RNG
stream, and the full-TrainState orbax checkpoint make a resumed run
bit-identical to an uninterrupted one (a capability the reference lacks:
SURVEY.md §5 'model checkpoints only, no mid-run resume')."""

import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

T, H, W = 4, 32, 32
N_SHARDS = 8
BS = 2
STEPS = 20
RESUME_AT = 10


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    for i in range(N_SHARDS):
        np.savez(
            d / f"clip_{i:03d}.npz",
            video=rng.uniform(-1, 1, (T, H, W, 3)).astype(np.float32),
            normed_allpts=rng.uniform(-1, 1, (T, H, W, 3)).astype(np.float32),
            plucker_raymap=rng.uniform(-1, 1, (T, H, W, 3)).astype(np.float32),
            plucker_cross=rng.uniform(-1, 1, (T, H, W, 3)).astype(np.float32),
            inverse_depth=rng.uniform(-1, 1, (T, H, W, 1)).astype(np.float32),
            fps=np.int32(24),
        )
    return str(d)


def _run(data_dir, out_dir, steps, resume=False):
    from geo4d_tpu.cli.train import main

    argv = [
        "--data_dir", data_dir,
        "--out_dir", out_dir,
        "--steps", str(steps),
        "--batch_size", str(BS),
        "--video_length", str(T),
        "--height", str(H),
        "--width", str(W),
        "--ckpt_every", str(RESUME_AT),
        "--tiny",
        "--fsdp",
        "--fsdp_min_size", "1024",
        "--mesh_devices", "8",
        "--mesh_platform", "cpu",
        "--seed", "17",
    ]
    if resume:
        argv.append("--resume")
    main(argv)


def _losses(out_dir):
    rows = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    return {r["step"]: r["loss_simple"] for r in rows if "loss_simple" in r}


def _load_tree(path, template):
    from geo4d_tpu.models.checkpoint import restore_checkpoint

    return restore_checkpoint(path, template)


@pytest.fixture(scope="module")
def soak(data_dir, tmp_path_factory):
    dir_a = str(tmp_path_factory.mktemp("runA"))
    dir_b = str(tmp_path_factory.mktemp("runB"))
    _run(data_dir, dir_a, STEPS)                 # uninterrupted
    _run(data_dir, dir_b, RESUME_AT)             # interrupted at step 10...
    _run(data_dir, dir_b, STEPS, resume=True)    # ...restart + resume
    return dir_a, dir_b


def test_soak_runs_all_steps(soak):
    dir_a, dir_b = soak
    la, lb = _losses(dir_a), _losses(dir_b)
    assert set(range(STEPS)) <= set(la), f"run A missing steps: {sorted(la)}"
    assert set(range(STEPS)) <= set(lb)
    assert all(np.isfinite(v) for v in la.values())


def test_resume_loss_continuity(soak):
    """Every post-resume step of run B reproduces run A's loss exactly —
    same data order (epoch plan fast-forward), same RNG (fold_in(seed, i)),
    same state (full-TrainState checkpoint)."""
    dir_a, dir_b = soak
    la, lb = _losses(dir_a), _losses(dir_b)
    for i in range(STEPS):
        assert la[i] == pytest.approx(lb[i], rel=1e-6, abs=1e-9), (
            f"step {i}: run A loss {la[i]} != resumed run B loss {lb[i]}"
        )


def test_resume_ema_determinism(soak):
    """Final EMA weights of the resumed run match the uninterrupted run."""
    dir_a, dir_b = soak
    from geo4d_tpu.models import presets

    model = presets.tiny(temporal_length=T)
    params = presets.init_params(
        model, jax.random.PRNGKey(17), (H, W), temporal_length=T,
        with_text=False,
    )
    template = {"unet": params["unet"]}
    ema_a = _load_tree(os.path.join(dir_a, "ckpt_final"), template)
    ema_b = _load_tree(os.path.join(dir_b, "ckpt_final"), template)
    leaves_a = jax.tree_util.tree_leaves(ema_a)
    leaves_b = jax.tree_util.tree_leaves(ema_b)
    assert leaves_a and len(leaves_a) == len(leaves_b)
    worst = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(leaves_a, leaves_b)
    )
    assert worst < 1e-7, f"EMA divergence after resume: {worst}"
    # and training actually moved the weights
    init = jax.tree_util.tree_leaves(template)
    moved = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(leaves_a, init)
    )
    assert moved > 0, "EMA equals init — training had no effect"
