"""Mesh -> depth rendering (host-side; C++ z-buffer via ctypes).

Replaces the reference's pyrender OpenGL depth pass
(preprocess_scannetpp.py:195,290-296): ScanNet++ GT depth comes from
rasterizing the laser-scan mesh at each camera. The C++ rasterizer
(native/mesh_raster.cpp) is perspective-correct (1/z interpolation) and
needs no GL context; a vectorized numpy fallback covers test/CI
environments without the compiled library.

Also a minimal binary-PLY mesh reader (trimesh.exchange.ply replacement
for the one layout ScanNet++ ships).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libgeo4d_raster.so",
)
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        try:
            subprocess.run(["bash", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            _lib = False
            return False
    if not os.path.exists(_LIB_PATH):
        _lib = False
        return False
    lib = ctypes.CDLL(_LIB_PATH)
    lib.raster_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.raster_depth.restype = None
    _lib = lib
    return lib


def render_mesh_depth(
    verts: np.ndarray,      # (V, 3) world-space float
    faces: np.ndarray,      # (F, 3) int
    K: np.ndarray,          # (3, 3)
    cam2world: np.ndarray,  # (4, 4) OpenCV convention (+z forward)
    size_hw: Tuple[int, int],
    znear: float = 0.05,
    zfar: float = 20.0,
) -> np.ndarray:
    """Depth map of the mesh seen from the camera; 0 = no geometry."""
    H, W = size_hw
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    w2c = np.ascontiguousarray(np.linalg.inv(cam2world), np.float32)
    fx, fy = float(K[0, 0]), float(K[1, 1])
    cx, cy = float(K[0, 2]), float(K[1, 2])

    lib = _load_native()
    if lib:
        out = np.zeros((H, W), np.float32)
        lib.raster_depth(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
            w2c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fx, fy, cx, cy, W, H, znear, zfar,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return _raster_depth_numpy(verts, faces, w2c, fx, fy, cx, cy, W, H,
                               znear, zfar)


def _raster_depth_numpy(verts, faces, w2c, fx, fy, cx, cy, W, H,
                        znear, zfar) -> np.ndarray:
    """Fallback rasterizer: same math, per-triangle numpy (small meshes)."""
    cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    valid = z > 1e-9
    iz = np.where(valid, 1.0 / np.maximum(z, 1e-9), -1.0)
    sx = fx * cam[:, 0] * iz + cx
    sy = fy * cam[:, 1] * iz + cy
    zbuf = np.full((H, W), np.inf, np.float32)

    for a, b, c in faces:
        if not (valid[a] and valid[b] and valid[c]):
            continue
        xs = np.array([sx[a], sx[b], sx[c]])
        ys = np.array([sy[a], sy[b], sy[c]])
        izs = np.array([iz[a], iz[b], iz[c]])
        ix0 = max(0, int(np.floor(xs.min())))
        ix1 = min(W - 1, int(np.ceil(xs.max())))
        iy0 = max(0, int(np.floor(ys.min())))
        iy1 = min(H - 1, int(np.ceil(ys.max())))
        if ix0 > ix1 or iy0 > iy1:
            continue
        area = (xs[1] - xs[0]) * (ys[2] - ys[0]) - (xs[2] - xs[0]) * (ys[1] - ys[0])
        if abs(area) < 1e-12:
            continue
        gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
        w0 = ((xs[1] - gx) * (ys[2] - gy) - (xs[2] - gx) * (ys[1] - gy)) / area
        w1 = ((xs[2] - gx) * (ys[0] - gy) - (xs[0] - gx) * (ys[2] - gy)) / area
        w2 = 1.0 - w0 - w1
        eps = -1e-5  # edge-through-pixel-center rounding (see C++)
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        inv_z = w0 * izs[0] + w1 * izs[1] + w2 * izs[2]
        with np.errstate(divide="ignore"):
            zpix = np.where(inv_z > 0, 1.0 / inv_z, np.inf)
        zpix = np.where(inside & (zpix >= znear) & (zpix <= zfar), zpix, np.inf)
        patch = zbuf[iy0: iy1 + 1, ix0: ix1 + 1]
        np.minimum(patch, zpix, out=patch)
    out = np.where(np.isinf(zbuf), 0.0, zbuf).astype(np.float32)
    return out


def load_ply_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal PLY mesh reader for ScanNet++'s mesh_aligned_0.05.ply
    (binary_little_endian, float x/y/z [+ extra vertex props], uchar-count
    int face indices). Returns (verts (V,3) f32, faces (F,3) i32)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        fmt = None
        n_verts = n_faces = 0
        vert_props = []          # (name, dtype) in declared order
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            tok = line.split()
            if tok[0] == b"format":
                fmt = tok[1]
            elif tok[0] == b"element":
                in_vertex = tok[1] == b"vertex"
                if in_vertex:
                    n_verts = int(tok[2])
                elif tok[1] == b"face":
                    n_faces = int(tok[2])
            elif tok[0] == b"property" and in_vertex:
                tmap = {b"float": "<f4", b"float32": "<f4", b"double": "<f8",
                        b"uchar": "u1", b"uint8": "u1", b"int": "<i4",
                        b"uint": "<u4", b"short": "<i2", b"ushort": "<u2"}
                vert_props.append((tok[2].decode(), tmap[tok[1]]))

        if fmt == b"ascii":
            verts = np.loadtxt([f.readline() for _ in range(n_verts)],
                               dtype=np.float64)[:, :3]
            faces = []
            for _ in range(n_faces):
                row = f.readline().split()
                faces.append([int(v) for v in row[1:4]])
            return verts.astype(np.float32), np.asarray(faces, np.int32)

        assert fmt == b"binary_little_endian", f"unsupported PLY format {fmt}"
        vdt = np.dtype([(n, t) for n, t in vert_props])
        raw = np.frombuffer(f.read(n_verts * vdt.itemsize), dtype=vdt,
                            count=n_verts)
        verts = np.stack([raw["x"], raw["y"], raw["z"]], -1).astype(np.float32)
        # faces: uchar count + count int32 indices; assume triangles
        fdata = f.read()
    face_dt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
    faces = np.frombuffer(fdata, dtype=face_dt, count=n_faces)
    assert (faces["n"] == 3).all(), "non-triangular PLY faces"
    return verts, np.ascontiguousarray(faces["idx"], np.int32)
