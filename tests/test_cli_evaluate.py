"""End-to-end eval-CLI smoke test on a synthetic Sintel-style layout
(tiny random model; exercises the full harness: sliding windows ->
alignment -> depth metrics with align-mask + error maps -> pose metrics
-> weighted aggregation -> log files)."""

import os
import struct

import numpy as np
import pytest

TAG = 202021.25


def _write_dpt(path, depth):
    h, w = depth.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<fii", TAG, w, h))
        depth.astype(np.float32).tofile(f)


def _write_cam(path, K, E):
    with open(path, "wb") as f:
        f.write(struct.pack("<f", TAG))
        K.astype(np.float64).tofile(f)
        E.astype(np.float64).tofile(f)


@pytest.fixture
def sintel_root(tmp_path):
    from PIL import Image

    seq = "alley_2"  # in SINTEL_POSE_SEQS -> pose eval path runs
    n, h, w = 18, 48, 96
    img_dir = tmp_path / "training" / "final" / seq
    depth_dir = tmp_path / "training" / "depth" / seq
    cam_dir = tmp_path / "training" / "camdata_left" / seq
    for d in (img_dir, depth_dir, cam_dir):
        d.mkdir(parents=True)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
    for i in range(n):
        Image.fromarray(np.roll(base, 2 * i, axis=1)).save(
            img_dir / f"frame_{i + 1:04d}.png"
        )
        _write_dpt(depth_dir / f"frame_{i + 1:04d}.dpt",
                   rng.uniform(2, 6, (h, w)).astype(np.float32))
        E = np.hstack([np.eye(3), np.array([[0.05 * i], [0.0], [0.0]])])
        _write_cam(cam_dir / f"frame_{i + 1:04d}.cam", K, E)
    return str(tmp_path), seq


def test_evaluate_cli_end_to_end(sintel_root, tmp_path):
    from geo4d_tpu.cli.evaluate import main

    root, seq = sintel_root
    out = str(tmp_path / "eval_out")
    main([
        "--dataset", "sintel", "--data_root", root, "--savedir", out,
        "--seq_list", seq, "--tiny", "--video_length", "4", "--stride", "2",
        "--n_iter", "10", "--ddim_steps", "2",
    ])

    # the reference harness's log contract (infer_geo4d.py:550-648)
    depth_log = open(os.path.join(out, "_error_log_depth.txt")).read()
    assert seq in depth_log and "Abs Rel" in depth_log
    summary = open(os.path.join(out, "_error_log_all.txt")).read()
    assert "Abs Rel" in summary
    assert os.path.exists(os.path.join(out, "time_cost.txt"))
    pose_log = open(os.path.join(out, "_error_log.txt")).read()
    assert seq in pose_log

    # per-sequence results dir with the viser contract + error maps
    seq_dir = os.path.join(out, seq)
    assert os.path.exists(os.path.join(seq_dir, "pred_traj.txt"))
    assert os.path.exists(os.path.join(seq_dir, "error_0.png"))
    traj = np.loadtxt(os.path.join(seq_dir, "pred_traj.txt"))
    assert traj.shape == (18, 8) and np.isfinite(traj).all()
