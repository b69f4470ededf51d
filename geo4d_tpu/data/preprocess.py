"""Offline evaluation-dataset preparation.

Parity target: reference datasets_preprocess/prepare_{bonn,tum,scannet,
kitti}.py — each builds the fixed eval subsets that the metadata registry
points at (dust3r/eval_metadata_geo4d.py):
  bonn:    first 110 frames -> rgbd_bonn_<seq>/{rgb_110, depth_110,
           groundtruth_110.txt}
  tum:     first 90 frames (stride 3 of 270) -> <seq>/{rgb_90, depth_90,
           groundtruth_90.txt}
  scannet: 90 frames stride 3 -> <seq>/{color_90, depth_90, pose_90.txt}
  kitti:   val_selection_cropped images gathered per sequence into
           image_gathered/ + depth_gathered/

These are host-side file operations (pure python; no torch dependency).
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import List, Optional


def _copy_subset(files: List[str], out_dir: str, n: int, stride: int = 1):
    os.makedirs(out_dir, exist_ok=True)
    taken = files[: n * stride : stride]
    for f in taken:
        shutil.copy2(f, os.path.join(out_dir, os.path.basename(f)))
    return taken


def prepare_bonn(root: str, seqs: Optional[List[str]] = None, n_frames: int = 110):
    """rgbd_bonn_<seq>/rgb -> rgb_110 (+depth_110, groundtruth_110.txt)."""
    seqs = seqs or ["balloon2", "crowd2", "crowd3", "person_tracking2",
                    "synchronous"]
    for seq in seqs:
        base = os.path.join(root, f"rgbd_bonn_{seq}")
        rgbs = sorted(glob.glob(os.path.join(base, "rgb", "*.png")))
        depths = sorted(glob.glob(os.path.join(base, "depth", "*.png")))
        _copy_subset(rgbs, os.path.join(base, f"rgb_{n_frames}"), n_frames)
        _copy_subset(depths, os.path.join(base, f"depth_{n_frames}"), n_frames)
        gt = os.path.join(base, "groundtruth.txt")
        if os.path.exists(gt):
            rows = [l for l in open(gt) if not l.startswith("#")]
            with open(os.path.join(base, f"groundtruth_{n_frames}.txt"), "w") as f:
                f.writelines(rows[:n_frames])


def prepare_tum(root: str, seqs: Optional[List[str]] = None,
                n_frames: int = 90, stride: int = 3):
    """<seq>/rgb -> rgb_90 at stride 3 (+groundtruth_90.txt)."""
    seqs = seqs or sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    for seq in seqs:
        base = os.path.join(root, seq)
        rgbs = sorted(glob.glob(os.path.join(base, "rgb", "*.png")))
        if not rgbs:
            continue
        _copy_subset(rgbs, os.path.join(base, f"rgb_{n_frames}"), n_frames, stride)
        gt = os.path.join(base, "groundtruth.txt")
        if os.path.exists(gt):
            rows = [l for l in open(gt) if not l.startswith("#")]
            with open(os.path.join(base, f"groundtruth_{n_frames}.txt"), "w") as f:
                f.writelines(rows[: n_frames * stride : stride])


def prepare_scannet(root: str, seqs: Optional[List[str]] = None,
                    n_frames: int = 90, stride: int = 3):
    """<seq>/color -> color_90 (+depth_90, pose_90.txt of flattened c2w)."""
    import numpy as np

    seqs = seqs or sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    for seq in seqs:
        base = os.path.join(root, seq)
        colors = sorted(
            glob.glob(os.path.join(base, "color", "*")),
            key=lambda p: int(re.sub(r"\D", "", os.path.basename(p)) or 0),
        )
        if not colors:
            continue
        _copy_subset(colors, os.path.join(base, f"color_{n_frames}"), n_frames, stride)
        depths = sorted(
            glob.glob(os.path.join(base, "depth", "*")),
            key=lambda p: int(re.sub(r"\D", "", os.path.basename(p)) or 0),
        )
        _copy_subset(depths, os.path.join(base, f"depth_{n_frames}"), n_frames, stride)
        pose_files = sorted(
            glob.glob(os.path.join(base, "pose", "*.txt")),
            key=lambda p: int(re.sub(r"\D", "", os.path.basename(p)) or 0),
        )
        if pose_files:
            poses = [np.loadtxt(p).reshape(-1) for p in
                     pose_files[: n_frames * stride : stride]]
            np.savetxt(os.path.join(base, f"pose_{n_frames}.txt"), np.stack(poses))


def prepare_kitti(root: str):
    """Gather val_selection_cropped into per-sequence dirs.

    Filenames look like <seq>_<category>_<frame>_<cam>.png; images sharing
    a sequence id group into image_gathered/<seq>/ (+ depth_gathered)."""
    img_dir = os.path.join(root, "image")
    depth_dir = os.path.join(root, "groundtruth_depth")
    for src, dst in [(img_dir, "image_gathered"), (depth_dir, "depth_gathered")]:
        if not os.path.isdir(src):
            continue
        for f in sorted(glob.glob(os.path.join(src, "*.png"))):
            name = os.path.basename(f)
            m = re.match(r"(.+?_drive_\d+_sync)", name)
            seq = m.group(1) if m else "seq"
            out = os.path.join(root, dst, seq)
            os.makedirs(out, exist_ok=True)
            shutil.copy2(f, os.path.join(out, name))


def prepare_nyuv2(root: str):
    """NYUv2 val split: official/*.h5 -> nyu_images/*.png + nyu_depths/*.npy
    + normalized nyu_depth_imgs/*.png (datasets_preprocess/
    prepare_nyuv2.py:1-84 semantics)."""
    import h5py
    import numpy as np
    from PIL import Image

    src = os.path.join(root, "official")
    img_dir = os.path.join(root, "nyu_images")
    dep_dir = os.path.join(root, "nyu_depths")
    dimg_dir = os.path.join(root, "nyu_depth_imgs")
    for d in (img_dir, dep_dir, dimg_dir):
        os.makedirs(d, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(src, "*.h5"))):
        base = os.path.splitext(os.path.basename(path))[0]
        with h5py.File(path, "r") as h5:
            depth = np.asarray(h5["depth"])
            rgb = np.transpose(np.asarray(h5["rgb"]), (1, 2, 0))
        Image.fromarray(rgb.astype(np.uint8)).save(
            os.path.join(img_dir, f"{base}.png")
        )
        np.save(os.path.join(dep_dir, f"{base}.npy"), depth)
        lo, hi = depth.min(), depth.max()
        norm = (depth - lo) / max(hi - lo, 1e-12)
        Image.fromarray((norm * 255).astype(np.uint8)).save(
            os.path.join(dimg_dir, f"{base}.png")
        )


def read_flo(path: str):
    """Middlebury .flo optical-flow reader (sintel_get_dynamics.py:9-24).
    Returns (H, W, 2) float32."""
    import numpy as np

    with open(path, "rb") as f:
        tag = np.fromfile(f, np.float32, 1)[0]
        assert abs(tag - 202021.25) < 1e-3, f"bad .flo tag in {path}"
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        data = np.fromfile(f, np.float32, -1).reshape(h, w * 2)
    u = data[:, np.arange(w) * 2]
    v = data[:, np.arange(w) * 2 + 1]
    return np.stack([u, v], axis=-1)


def sintel_get_dynamics(
    base_dir: str,
    seq: str,
    threshold: float = 13.75,
    continuous: bool = False,
    save_dir: str = "dynamic_label",
):
    """Generate per-frame dynamic-region labels for one Sintel training
    sequence (datasets_preprocess/sintel_get_dynamics.py:109-170): rigid
    flow induced by GT depth + camera motion vs GT optical flow; pixels
    with absolute flow error > threshold (13.75 px) are dynamic. With
    `continuous`, writes the normalized error map instead."""
    import numpy as np
    from PIL import Image

    from geo4d_tpu.data.datasets import read_dpt, read_sintel_cam

    depth_dir = os.path.join(base_dir, "depth", seq)
    cam_dir = os.path.join(base_dir, "camdata_left", seq)
    flow_dir = os.path.join(base_dir, "flow", seq)
    out_dir = os.path.join(base_dir, save_dir, seq)
    os.makedirs(out_dir, exist_ok=True)

    frames = sorted(f for f in os.listdir(depth_dir) if f.endswith(".dpt"))
    written = []
    for i in range(len(frames) - 1):
        fid1 = frames[i].split(".")[0]
        fid2 = frames[i + 1].split(".")[0]
        d1 = read_dpt(os.path.join(depth_dir, frames[i]))
        K1, E1 = read_sintel_cam(os.path.join(cam_dir, f"{fid1}.cam"))
        K2, E2 = read_sintel_cam(os.path.join(cam_dir, f"{fid2}.cam"))
        h, w = d1.shape

        # rigid flow: unproject frame-1 depth, move by the relative pose,
        # reproject (sintel_get_dynamics.py:60-107). Sintel .cam extrinsics
        # are world-to-cam; pose = inv(E) is cam-to-world.
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        px = (x - K1[0, 2]) * d1 / K1[0, 0]
        py = (y - K1[1, 2]) * d1 / K1[1, 1]
        p1 = np.stack([px, py, d1], axis=-1).reshape(-1, 3)
        pose1 = np.linalg.inv(np.vstack([E1, [0, 0, 0, 1]]))
        pose2 = np.linalg.inv(np.vstack([E2, [0, 0, 0, 1]]))
        rel = np.linalg.inv(pose2) @ pose1
        p2 = p1 @ rel[:3, :3].T + rel[:3, 3]
        uv1 = (p1 @ K1.T)
        uv1 = uv1[:, :2] / uv1[:, 2:]
        uv2 = (p2 @ K2.T)
        uv2 = uv2[:, :2] / uv2[:, 2:]
        rigid_flow = (uv2 - uv1).reshape(h, w, 2)

        gt_flow = read_flo(os.path.join(flow_dir, f"{fid1}.flo"))
        err = np.linalg.norm(gt_flow - rigid_flow, axis=-1)
        out_path = os.path.join(out_dir, f"{fid1}.png")
        if continuous:
            img = (err / max(err.max(), 1e-12) * 255).astype(np.uint8)
        else:
            img = (err > threshold).astype(np.uint8) * 255
        Image.fromarray(img).save(out_path)
        written.append(out_path)
    return written


def compute_dynamic_masks(
    flows_fwd, flows_bwd, depths, poses, K, motion_thresh: float = 0.35
):
    """Sintel-style dynamic-region masks (datasets_preprocess/
    sintel_get_dynamics.py semantics): pixels whose observed flow deviates
    from the rigid flow induced by depth+camera motion are dynamic.

    flows_*: (N-1, H, W, 2) observed flow; depths (N, H, W); poses (N,4,4)
    c2w; K (3,3). Returns (N-1, H, W) bool dynamic masks.
    """
    import jax
    import jax.numpy as jnp

    from geo4d_tpu.geometry.warp import depth_based_flow

    def pair(d, p_src, p_dst, f_obs):
        f_rigid, valid = depth_based_flow(d, p_src, p_dst, K)
        err = jnp.linalg.norm(f_obs - f_rigid, axis=-1)
        mag = jnp.linalg.norm(f_obs, axis=-1) + 1.0
        return (err / mag > motion_thresh) & valid

    return jax.vmap(pair)(depths[:-1], poses[:-1], poses[1:], flows_fwd)
