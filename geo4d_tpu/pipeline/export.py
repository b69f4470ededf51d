"""Results export honoring the reference's file contract.

Parity target: reference dust3r/cloud_opt/base_opt_group.py:383-464
(save_tum_poses / save_focals / save_intrinsics / save_depth_maps /
save_conf_maps / save_init_conf_maps / save_rgb_imgs) — these exact files
are what the vendored viser visualizer reads
(viser/src/viser/extras/_record3d_customized.py:18-…):
  pred_traj.txt        TUM rows
  pred_focal.txt       one focal per line
  pred_intrinsics.txt  flattened 3x3 per line
  frame_XXXX.npy       per-frame depth (H, W) float32
  conf_XXXX.npy        per-frame confidence
  init_conf_XXXX.npy   initial confidence
  frame_XXXX.png       rgb frame
  scene.glb            point-cloud export (dust3r/demo.py:56-86)

The GLB writer is self-contained (no trimesh): a minimal glTF 2.0 binary
with POSITION + COLOR_0 point primitives.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional

import numpy as np


def save_results_dir(
    out_dir: str,
    aligner,
    rgb_frames: Optional[np.ndarray] = None,   # (N,H,W,3) [-1,1] or uint8
    save_glb: bool = True,
    conf_threshold: float = 1e-3,
    dynamic_masks: Optional[np.ndarray] = None,  # (N, H, W) bool/0-1
):
    if rgb_frames is not None and rgb_frames.dtype == np.uint8:
        # uint8 ingest path (data/video.py raw_uint8) — same normalization
        rgb_frames = (rgb_frames.astype(np.float32) / 255.0 - 0.5) * 2.0
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, "pred_traj.txt"), aligner.get_tum_poses())
    np.savetxt(os.path.join(out_dir, "pred_focal.txt"), aligner.get_focals())
    K = aligner.get_intrinsics()
    np.savetxt(os.path.join(out_dir, "pred_intrinsics.txt"), K.reshape(len(K), 9))

    depths = aligner.get_depthmaps()
    confs = aligner.get_conf()
    init_confs = aligner.get_init_conf()
    for i in range(len(depths)):
        np.save(os.path.join(out_dir, f"frame_{i:04d}.npy"), depths[i])
        np.save(os.path.join(out_dir, f"conf_{i:04d}.npy"), confs[i])
        np.save(os.path.join(out_dir, f"init_conf_{i:04d}.npy"), init_confs[i])

    if rgb_frames is not None:
        try:
            from PIL import Image

            for i in range(len(rgb_frames)):
                img = ((rgb_frames[i] + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(out_dir, f"frame_{i:04d}.png")
                )
        except ImportError:
            pass

    if dynamic_masks is not None:
        # filename convention the vendored viser reader globs
        # (_record3d_customized.py:64 `enlarged_dynamic_mask_*.png`,
        # indexed without zero padding)
        try:
            from PIL import Image

            for i in range(len(dynamic_masks)):
                m = (np.asarray(dynamic_masks[i]) > 0).astype(np.uint8) * 255
                Image.fromarray(m).save(
                    os.path.join(out_dir, f"enlarged_dynamic_mask_{i}.png")
                )
        except ImportError:
            pass

    if save_glb:
        pts = aligner.get_pts3d().reshape(-1, 3)
        mask = (confs > conf_threshold).reshape(-1)
        if rgb_frames is not None:
            colors = ((rgb_frames + 1) / 2).clip(0, 1).reshape(-1, 3)
        else:
            colors = np.full_like(pts, 0.5)
        # camera frusta alongside the cloud (dust3r/viz.py:258 add_scene_cam)
        poses = aligner.get_im_poses()
        focals = aligner.get_focals()
        h, w = depths.shape[1:]
        scene_scale = float(
            np.linalg.norm(poses[:, :3, 3] - poses[:, :3, 3].mean(0), axis=1).max()
        )
        fv, fc, ff = camera_frusta_mesh(
            poses, focals, (w, h), screen_width=max(scene_scale, 1e-3) * 0.1
        )
        write_scene_glb(
            os.path.join(out_dir, "scene.glb"),
            pts[mask], colors[mask], fv, fc, ff,
        )


# per-camera edge colors cycled like the reference's CAM_COLORS
# (dust3r/viz.py:14-21) — values are original
_CAM_PALETTE = np.asarray(
    [
        [0.90, 0.10, 0.10], [0.10, 0.60, 0.90], [0.10, 0.80, 0.30],
        [0.95, 0.75, 0.10], [0.70, 0.30, 0.85], [0.95, 0.45, 0.10],
        [0.20, 0.85, 0.80], [0.55, 0.55, 0.55],
    ],
    np.float32,
)


def camera_frustum_mesh(
    c2w: np.ndarray,            # (4, 4)
    focal: float,
    imsize_wh: tuple,
    color: np.ndarray,          # (3,)
    screen_width: float = 0.03,
):
    """One camera as a 5-vertex pyramid: apex at the optical center, base =
    image plane at depth `height` (parity: dust3r/viz.py:258-296
    add_scene_cam's 4-section cone with aspect + focal scaling).

    Returns (verts (5,3), colors (5,3), faces (6,3))."""
    w, h = imsize_wh
    focal = float(np.atleast_1d(focal)[0]) or min(h, w) * 1.1
    height = max(screen_width / 10, focal * screen_width / h)
    half = screen_width * 0.5**0.5
    aspect = w / h
    # camera-frame corners; OpenCV convention (+z forward, +y down) to
    # match get_pts3d's unprojection frame
    corners = np.asarray(
        [
            [-half * aspect, -half, height],
            [half * aspect, -half, height],
            [half * aspect, half, height],
            [-half * aspect, half, height],
        ],
        np.float32,
    )
    verts = np.concatenate([np.zeros((1, 3), np.float32), corners], axis=0)
    verts = verts @ c2w[:3, :3].T.astype(np.float32) + c2w[:3, 3].astype(
        np.float32
    )
    faces = np.asarray(
        [[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1], [1, 2, 3], [1, 3, 4]],
        np.uint32,
    )
    cols = np.tile(np.asarray(color, np.float32), (5, 1))
    return verts, cols, faces


def camera_frusta_mesh(
    poses: np.ndarray,          # (N, 4, 4)
    focals: np.ndarray,         # (N,)
    imsize_wh: tuple,
    screen_width: float = 0.03,
):
    """All cameras merged into one colored triangle soup."""
    vs, cs, fs = [], [], []
    off = 0
    for i in range(len(poses)):
        v, c, f = camera_frustum_mesh(
            poses[i], focals[i] if i < len(focals) else focals[-1],
            imsize_wh, _CAM_PALETTE[i % len(_CAM_PALETTE)], screen_width,
        )
        vs.append(v)
        cs.append(c)
        fs.append(f + off)
        off += len(v)
    return (
        np.concatenate(vs, axis=0),
        np.concatenate(cs, axis=0),
        np.concatenate(fs, axis=0),
    )


def write_pointcloud_glb(path: str, points: np.ndarray, colors: np.ndarray):
    """Minimal binary glTF point cloud (POINTS primitive, POSITION+COLOR_0)."""
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n = len(points)
    pos_bytes = points.tobytes()
    col_bytes = colors.tobytes()
    bin_data = pos_bytes + col_bytes
    pad = (4 - len(bin_data) % 4) % 4
    bin_data += b"\x00" * pad

    gltf = {
        "asset": {"version": "2.0", "generator": "geo4d_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "COLOR_0": 1},
                        "mode": 0,  # POINTS
                    }
                ]
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": n,
                "type": "VEC3",
                "min": points.min(0).tolist() if n else [0, 0, 0],
                "max": points.max(0).tolist() if n else [0, 0, 0],
            },
            {
                "bufferView": 1,
                "componentType": 5126,
                "count": n,
                "type": "VEC3",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {
                "buffer": 0,
                "byteOffset": len(pos_bytes),
                "byteLength": len(col_bytes),
            },
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    json_data = json.dumps(gltf).encode()
    json_pad = (4 - len(json_data) % 4) % 4
    json_data += b" " * json_pad

    total = 12 + 8 + len(json_data) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))      # glTF header
        f.write(struct.pack("<II", len(json_data), 0x4E4F534A))  # JSON chunk
        f.write(json_data)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))   # BIN chunk
        f.write(bin_data)


def pointmap_to_mesh(
    pts: np.ndarray,      # (H, W, 3)
    colors: np.ndarray,   # (H, W, 3) in [0, 1]
    mask: Optional[np.ndarray] = None,
):
    """Per-pixel grid mesh: two triangles per pixel quad, triangles with
    any masked vertex dropped (parity: dust3r/viz.py:40 pts3d_to_trimesh).

    Returns (vertices (V,3), vertex_colors (V,3), faces (F,3))."""
    h, w = pts.shape[:2]
    verts = pts.reshape(-1, 3).astype(np.float32)
    cols = colors.reshape(-1, 3).astype(np.float32)
    idx = np.arange(h * w).reshape(h, w)
    tl = idx[:-1, :-1].ravel()
    tr = idx[:-1, 1:].ravel()
    bl = idx[1:, :-1].ravel()
    br = idx[1:, 1:].ravel()
    faces = np.concatenate(
        [np.stack([tl, bl, tr], 1), np.stack([tr, bl, br], 1)], axis=0
    ).astype(np.uint32)
    if mask is not None:
        ok = mask.reshape(-1)
        keep = ok[faces].all(axis=1)
        faces = faces[keep]
    return verts, cols, faces


def write_mesh_glb(path: str, vertices: np.ndarray, colors: np.ndarray,
                   faces: np.ndarray):
    """Binary glTF triangle mesh with vertex colors."""
    vertices = np.asarray(vertices, np.float32)
    colors = np.asarray(colors, np.float32)
    faces = np.asarray(faces, np.uint32)
    pos_b = vertices.tobytes()
    col_b = colors.tobytes()
    idx_b = faces.tobytes()
    bin_data = pos_b + col_b + idx_b
    pad = (4 - len(bin_data) % 4) % 4
    bin_data += b"\x00" * pad
    gltf = {
        "asset": {"version": "2.0", "generator": "geo4d_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "COLOR_0": 1},
            "indices": 2, "mode": 4,
        }]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(vertices),
             "type": "VEC3",
             "min": vertices.min(0).tolist() if len(vertices) else [0, 0, 0],
             "max": vertices.max(0).tolist() if len(vertices) else [0, 0, 0]},
            {"bufferView": 1, "componentType": 5126, "count": len(colors),
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5125, "count": faces.size,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(col_b)},
            {"buffer": 0, "byteOffset": len(pos_b) + len(col_b),
             "byteLength": len(idx_b)},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    json_data = json.dumps(gltf).encode()
    json_pad = (4 - len(json_data) % 4) % 4
    json_data += b" " * json_pad
    total = 12 + 8 + len(json_data) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_data), 0x4E4F534A))
        f.write(json_data)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))
        f.write(bin_data)


def write_scene_glb(
    path: str,
    points: np.ndarray,      # (N, 3) point cloud
    point_colors: np.ndarray,
    tri_verts: np.ndarray,   # (V, 3) camera-frusta triangle soup
    tri_colors: np.ndarray,
    tri_faces: np.ndarray,   # (F, 3) uint32
):
    """Binary glTF with TWO primitives: the point cloud and the camera
    frusta (parity: dust3r/demo.py:56-86 exports both into one scene)."""
    points = np.asarray(points, np.float32)
    point_colors = np.asarray(point_colors, np.float32)
    tri_verts = np.asarray(tri_verts, np.float32)
    tri_colors = np.asarray(tri_colors, np.float32)
    tri_faces = np.asarray(tri_faces, np.uint32)

    chunks = [points.tobytes(), point_colors.tobytes(),
              tri_verts.tobytes(), tri_colors.tobytes(), tri_faces.tobytes()]
    offsets, off = [], 0
    for c in chunks:
        offsets.append(off)
        off += len(c)
    bin_data = b"".join(chunks)
    bin_data += b"\x00" * ((4 - len(bin_data) % 4) % 4)

    def vec3_acc(view, count, arr=None):
        acc = {"bufferView": view, "componentType": 5126, "count": count,
               "type": "VEC3"}
        if arr is not None and count:
            acc["min"] = arr.min(0).tolist()
            acc["max"] = arr.max(0).tolist()
        elif arr is not None:
            acc["min"] = [0, 0, 0]
            acc["max"] = [0, 0, 0]
        return acc

    gltf = {
        "asset": {"version": "2.0", "generator": "geo4d_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0, "name": "pointcloud"},
                  {"mesh": 1, "name": "cameras"}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0, "COLOR_0": 1},
                             "mode": 0}]},
            {"primitives": [{"attributes": {"POSITION": 2, "COLOR_0": 3},
                             "indices": 4, "mode": 4}]},
        ],
        "accessors": [
            vec3_acc(0, len(points), points),
            vec3_acc(1, len(point_colors)),
            vec3_acc(2, len(tri_verts), tri_verts),
            vec3_acc(3, len(tri_colors)),
            {"bufferView": 4, "componentType": 5125, "count": tri_faces.size,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[i], "byteLength": len(chunks[i])}
            for i in range(5)
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    json_data = json.dumps(gltf).encode()
    json_data += b" " * ((4 - len(json_data) % 4) % 4)
    total = 12 + 8 + len(json_data) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_data), 0x4E4F534A))
        f.write(json_data)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))
        f.write(bin_data)


def save_depth_visualizations(out_dir: str, depths: np.ndarray,
                              fps: int = 8):
    """Colored depth PNGs + an animated GIF (parity:
    base_opt_group.py:433-461 save_depth_maps colormap GIFs)."""
    import matplotlib.cm as cm
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    d = np.asarray(depths, np.float32)
    lo, hi = np.percentile(d, 2), np.percentile(d, 98)
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    frames = []
    for i in range(len(d)):
        rgba = (cm.jet(norm[i]) * 255).astype(np.uint8)
        img = Image.fromarray(rgba[..., :3])
        img.save(os.path.join(out_dir, f"depth_{i:04d}.png"))
        frames.append(img)
    if frames:
        frames[0].save(
            os.path.join(out_dir, "depth.gif"), save_all=True,
            append_images=frames[1:], duration=int(1000 / fps), loop=0,
        )


def save_time_cost(path: str, timing: dict):
    """time_cost.txt contract (infer_geo4d.py:640-648)."""
    with open(path, "a") as f:
        f.write(
            f"diffusion {timing['diffusion_s']:.3f}s "
            f"alignment {timing['alignment_s']:.3f}s "
            f"frames {int(timing['frames'])} "
            f"sec/frame {timing['sec_per_frame']:.4f}\n"
        )
