"""Viewer/export tests over a synthetic results dir (host-only)."""

import os

import numpy as np
import pytest

from geo4d_tpu.evals.trajectory import Trajectory
from geo4d_tpu.pipeline.export import (
    pointmap_to_mesh,
    save_depth_visualizations,
    write_mesh_glb,
)
from geo4d_tpu.viz.visualizer import export_html, load_results_dir


@pytest.fixture
def results_dir(tmp_path):
    n, h, w = 3, 8, 10
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 0.1
    np.savetxt(tmp_path / "pred_traj.txt",
               Trajectory.from_matrices(poses).to_tum())
    K = np.tile(np.eye(3), (n, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 12.0
    K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
    np.savetxt(tmp_path / "pred_intrinsics.txt", K.reshape(n, 9))
    np.savetxt(tmp_path / "pred_focal.txt", np.full(n, 12.0))
    for i in range(n):
        np.save(tmp_path / f"frame_{i:04d}.npy",
                rng.uniform(2, 5, (h, w)).astype(np.float32))
        np.save(tmp_path / f"conf_{i:04d}.npy", np.ones((h, w), np.float32))
    return str(tmp_path)


def test_load_results_dir(results_dir):
    clouds, poses = load_results_dir(results_dir, downsample=1)
    assert len(clouds) == 3
    pts, cols = clouds[0]
    assert pts.shape == (80, 3)
    # poses recentered on middle frame -> middle pose ~ identity
    assert np.allclose(poses[1], np.eye(4), atol=1e-6)


def test_export_html(results_dir):
    out = export_html(results_dir, downsample=1)
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    assert '"frames":' in html and "webgl" in html.lower()
    assert len(html) > 2000


def test_mesh_glb(tmp_path):
    pts = np.random.default_rng(0).normal(size=(6, 8, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(6, 8, 3)).astype(np.float32)
    mask = np.ones((6, 8), bool)
    mask[0, 0] = False
    v, c, f = pointmap_to_mesh(pts, cols, mask)
    assert v.shape == (48, 3)
    full_tris = 2 * 5 * 7
    # only the first triangle of quad (0,0) touches the masked corner
    assert len(f) == full_tris - 1
    path = str(tmp_path / "mesh.glb")
    write_mesh_glb(path, v, c, f)
    data = open(path, "rb").read()
    assert data[:4] == b"glTF" and len(data) > 100


def test_depth_visualizations(tmp_path, results_dir):
    depths = np.stack([np.load(os.path.join(results_dir, f"frame_{i:04d}.npy"))
                       for i in range(3)])
    out = str(tmp_path / "viz")
    save_depth_visualizations(out, depths)
    assert os.path.exists(os.path.join(out, "depth_0000.png"))
    assert os.path.exists(os.path.join(out, "depth.gif"))
