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

pytestmark = pytest.mark.smoke  # CPU-light fast tier


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


def test_camera_frusta_and_scene_glb(tmp_path):
    """Frusta: one 5-vert pyramid per camera, apex at the optical center,
    combined with the point cloud into a 2-primitive GLB
    (dust3r/viz.py:258 add_scene_cam + demo.py:56-86)."""
    import json
    import struct

    from geo4d_tpu.pipeline.export import camera_frusta_mesh, write_scene_glb

    n = 4
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 0.5
    focals = np.full(n, 100.0)
    v, c, f = camera_frusta_mesh(poses, focals, (64, 48), screen_width=0.1)
    assert v.shape == (5 * n, 3) and f.shape == (6 * n, 3)
    # apex of camera i sits at its optical center
    for i in range(n):
        assert np.allclose(v[5 * i], poses[i, :3, 3], atol=1e-6)
    # faces index only within each camera's vertex block
    for i in range(n):
        blk = f[6 * i: 6 * (i + 1)]
        assert blk.min() >= 5 * i and blk.max() < 5 * (i + 1)

    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "scene.glb")
    write_scene_glb(path, pts, cols, v, c, f)
    data = open(path, "rb").read()
    assert data[:4] == b"glTF"
    json_len = struct.unpack("<I", data[12:16])[0]
    tree = json.loads(data[20: 20 + json_len])
    assert len(tree["meshes"]) == 2
    assert tree["meshes"][0]["primitives"][0]["mode"] == 0   # POINTS
    assert tree["meshes"][1]["primitives"][0]["mode"] == 4   # TRIANGLES
    assert tree["accessors"][0]["count"] == 100
    assert tree["accessors"][4]["count"] == f.size


def test_save_results_dir_with_masks_and_frusta(tmp_path):
    """save_results_dir writes the viser dynamic-mask convention
    (enlarged_dynamic_mask_{i}.png, _record3d_customized.py:64) and a
    frusta-bearing scene.glb."""
    pytest.importorskip("PIL")

    class FakeAligner:
        N, H, W = 2, 8, 10

        def get_tum_poses(self):
            return Trajectory.from_matrices(
                np.tile(np.eye(4), (2, 1, 1))
            ).to_tum()

        def get_focals(self):
            return np.full(2, 12.0)

        def get_intrinsics(self):
            K = np.tile(np.eye(3), (2, 1, 1))
            K[:, 0, 0] = K[:, 1, 1] = 12.0
            return K

        def get_im_poses(self):
            p = np.tile(np.eye(4), (2, 1, 1))
            p[1, 2, 3] = 0.3
            return p

        def get_depthmaps(self):
            return np.ones((2, 8, 10), np.float32)

        def get_conf(self):
            return np.ones((2, 8, 10), np.float32)

        def get_init_conf(self):
            return np.ones((2, 8, 10), np.float32)

        def get_pts3d(self):
            return np.random.default_rng(0).normal(size=(2, 8, 10, 3))

    from geo4d_tpu.pipeline.export import save_results_dir

    masks = np.zeros((2, 8, 10))
    masks[:, :4] = 1
    save_results_dir(str(tmp_path), FakeAligner(),
                     rgb_frames=np.zeros((2, 8, 10, 3)),
                     dynamic_masks=masks)
    from PIL import Image

    for i in range(2):
        p = tmp_path / f"enlarged_dynamic_mask_{i}.png"
        assert p.exists()
        m = np.asarray(Image.open(p))
        assert (m[:4] == 255).all() and (m[4:] == 0).all()
    assert (tmp_path / "scene.glb").exists()


def test_depth_visualizations(tmp_path, results_dir):
    depths = np.stack([np.load(os.path.join(results_dir, f"frame_{i:04d}.npy"))
                       for i in range(3)])
    out = str(tmp_path / "viz")
    save_depth_visualizations(out, depths)
    assert os.path.exists(os.path.join(out, "depth_0000.png"))
    assert os.path.exists(os.path.join(out, "depth.gif"))


def _ws_client(port):
    """Minimal raw-socket websocket client for tests."""
    import base64 as b64
    import socket as sk
    import struct as st

    s = sk.create_connection(("127.0.0.1", port), timeout=10)
    key = b64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
         f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
         f"Sec-WebSocket-Version: 13\r\n\r\n").encode()
    )
    # read response headers; KEEP any websocket bytes that piggybacked in
    # the same TCP segment (the meta frame often arrives with the 101)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    head, _, leftover = buf.partition(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n")[0]
    pending = [leftover]

    def recv_frame():
        def read_exact(k):
            d = b""
            while len(pending[0]) and len(d) < k:
                take = min(k - len(d), len(pending[0]))
                d += pending[0][:take]
                pending[0] = pending[0][take:]
            while len(d) < k:
                c = s.recv(k - len(d))
                assert c, "socket closed"
                d += c
            return d

        head = read_exact(2)
        op = head[0] & 0x0F
        n = head[1] & 0x7F
        if n == 126:
            n = st.unpack(">H", read_exact(2))[0]
        elif n == 127:
            n = st.unpack(">Q", read_exact(8))[0]
        return op, read_exact(n) if n else b""

    def send_text(text):
        payload = text.encode()
        mask = b"\x01\x02\x03\x04"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        s.sendall(bytes([0x81, 0x80 | len(payload)]) + mask + masked)

    return s, recv_frame, send_text


def test_interactive_viewer_server(results_dir):
    """The websocket viewer serves the player page, streams meta + binary
    frame payloads (header|int16 pos|uint8 col|f32 pose), and pushes live
    updates when new frames appear (viser-fork capability parity)."""
    import json
    import struct
    import urllib.request

    from geo4d_tpu.viz.server import ViewerServer

    srv = ViewerServer(results_dir, port=0).start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=10
        ).read().decode()
        assert "WebSocket" in html and "webgl" in html.lower()

        s, recv, send = _ws_client(srv.port)
        op, data = recv()
        assert op == 0x1
        meta = json.loads(data)
        assert meta["type"] == "meta" and meta["n_frames"] == 3

        send(json.dumps({"type": "get", "i": 1}))
        op, payload = recv()
        assert op == 0x2
        idx, n = struct.unpack("<II", payload[:8])
        assert idx == 1 and n > 0
        pts = np.frombuffer(payload[8: 8 + n * 6], "<i2").reshape(n, 3)
        cols = np.frombuffer(payload[8 + n * 6: 8 + n * 9], np.uint8)
        pose = np.frombuffer(payload[8 + n * 9:], "<f4").reshape(4, 4)
        assert np.abs(pts).max() <= 32767 and len(cols) == n * 3
        assert np.allclose(pose[3], [0, 0, 0, 1], atol=1e-5)

        # live update: add a frame, watcher-equivalent reload + broadcast
        d = np.load(os.path.join(results_dir, "frame_0000.npy"))
        np.save(os.path.join(results_dir, "frame_0003.npy"), d)
        np.savetxt(
            os.path.join(results_dir, "pred_traj.txt"),
            np.vstack([np.loadtxt(os.path.join(results_dir, "pred_traj.txt")),
                       [3, 0, 0, 0, 0, 0, 0, 1]]),
        )
        K = np.loadtxt(os.path.join(results_dir, "pred_intrinsics.txt"))
        np.savetxt(os.path.join(results_dir, "pred_intrinsics.txt"),
                   np.vstack([K, K[-1:]]))
        srv.store.reload()
        srv._broadcast({"type": "update",
                        "n_frames": srv.store.meta()["n_frames"]})
        op, data = recv()
        upd = json.loads(data)
        assert upd["type"] == "update" and upd["n_frames"] == 4
        s.close()
    finally:
        srv.stop()
