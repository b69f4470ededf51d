"""Video decode + frame loading for the inference pipeline.

Parity target: reference utils/funcs.py `load_video_batch` (:142-179):
decord C++ decode with resize-at-decode, stride sampling, last-frame
padding, output [-1, 1] float frames + effective fps. Here the decode
backend is OpenCV's C++ FFmpeg `VideoCapture` (the native geo4d_tpu
decoder in native/ supersedes it when built), resizing at decode time so
full-res frames never hit Python.

Also the image-directory loader mirroring dust3r/utils/image.py
`load_images_with_near_aspect_ratio` (:301-…): PIL load, resize to target
eval resolution, normalize to [-1, 1].
"""

from __future__ import annotations

import ctypes
import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_NATIVE_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libgeo4d_video.so",
)
_native = None


def _load_native():
    """Load the C++ FFmpeg decoder (native/video_decoder.cpp) via ctypes.

    The .so is not checked into git (binaries go stale vs their source);
    it is built on demand from native/build.sh the first time it's needed.
    """
    global _native
    if _native is not None:
        return _native
    if not os.path.exists(_NATIVE_LIB_PATH):
        build = os.path.join(os.path.dirname(_NATIVE_LIB_PATH), "build.sh")
        try:
            import subprocess

            subprocess.run(["bash", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            _native = False
            return False
    if not os.path.exists(_NATIVE_LIB_PATH):
        _native = False
        return False
    lib = ctypes.CDLL(_NATIVE_LIB_PATH)
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.vd_fps.restype = ctypes.c_double
    lib.vd_fps.argtypes = [ctypes.c_void_p]
    lib.vd_read_frames.restype = ctypes.c_int
    lib.vd_read_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    _native = lib
    return lib


def _load_video_native(path, frame_stride, video_size, max_frames):
    lib = _load_native()
    h, w = video_size
    handle = lib.vd_open(path.encode(), w, h)
    if not handle:
        raise FileNotFoundError(f"native decoder cannot open {path}")
    try:
        fps = lib.vd_fps(handle)
        cap = max_frames if max_frames > 0 else 100000
        buf = np.empty((cap, h, w, 3), np.uint8)
        n = lib.vd_read_frames(
            handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            frame_stride,
        )
    finally:
        lib.vd_close(handle)
    if n == 0:
        raise ValueError(f"no frames decoded from {path}")
    # buf[:n] is a view that would pin the full `cap`-frame decode buffer
    # (~49 GB virtual at 100k x 320x512) for the lifetime of the result;
    # copy when the decode under-filled it so the big buffer is freed.
    frames = buf[:n] if n == cap else buf[:n].copy()
    return frames, int(fps / frame_stride)


def _normalize(arr_u8: np.ndarray) -> np.ndarray:
    """uint8 (0..255) -> float32 [-1,1]; the pipeline applies the identical
    expression in-jit for uint8 ingest (pipeline/inference.py)."""
    return (arr_u8.astype(np.float32) / 255.0 - 0.5) * 2.0


def load_video(
    path: str,
    frame_stride: int = 1,
    video_size: Tuple[int, int] = (256, 256),  # (H, W)
    max_frames: int = -1,
    raw_uint8: bool = False,
) -> Tuple[np.ndarray, int]:
    """Decode a video -> ((T, H, W, 3) float32 in [-1,1], effective fps).

    max_frames=-1 takes all stride-sampled frames; short videos are padded
    by repeating the last frame (funcs.py:170-173).

    raw_uint8=True returns frames as uint8 (0..255) instead: the inference
    pipeline normalizes on device, so keeping the host array uint8 cuts the
    host->device upload (the slow link on a remote chip) by 4x.
    """
    if _load_native():
        arr, fps = _load_video_native(path, frame_stride, video_size, max_frames)
        if not raw_uint8:
            arr = _normalize(arr)
        if max_frames > 0 and len(arr) < max_frames:
            pad = np.repeat(arr[-1:], max_frames - len(arr), axis=0)
            arr = np.concatenate([arr, pad], axis=0)
        return arr, fps
    if not _HAS_CV2:
        raise RuntimeError("no video backend available (cv2 missing)")
    h, w = video_size
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % frame_stride == 0:
            frame = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if max_frames > 0 and len(frames) >= max_frames:
                break
        idx += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    arr = np.stack(frames)
    if not raw_uint8:
        arr = _normalize(arr)
    if max_frames > 0 and len(frames) < max_frames:
        pad = np.repeat(arr[-1:], max_frames - len(frames), axis=0)
        arr = np.concatenate([arr, pad], axis=0)
    return arr, int(fps / frame_stride)


def load_image_dir(
    dir_path: str,
    video_size: Tuple[int, int],   # (W, H) target resolution
    exts: Sequence[str] = (".png", ".jpg", ".jpeg"),
    max_frames: int = -1,
    raw_uint8: bool = False,
) -> Tuple[np.ndarray, List[str]]:
    """Load a sorted image directory -> ((T, H, W, 3) [-1,1], filenames).

    raw_uint8=True keeps frames uint8 (see `load_video`)."""
    from PIL import Image

    files = sorted(
        f
        for f in glob.glob(os.path.join(dir_path, "*"))
        if os.path.splitext(f)[1].lower() in exts
    )
    if max_frames > 0:
        files = files[:max_frames]
    if not files:
        raise FileNotFoundError(f"no images in {dir_path}")
    w, h = video_size
    frames = []
    for f in files:
        img = Image.open(f).convert("RGB").resize((w, h), Image.LANCZOS)
        frames.append(np.asarray(img, np.uint8))
    arr = np.stack(frames)
    if raw_uint8:
        return arr, files
    return _normalize(arr), files


def sliding_windows(n_frames: int, window: int = 16, stride: int = 4) -> np.ndarray:
    """Overlapping window index table (G, window).

    Mirrors the reference's slice list (infer_geo4d.py:412-418): stride-4
    starts plus a forced tail window covering the last `window` frames.
    """
    assert n_frames >= window, f"need >= {window} frames, got {n_frames}"
    starts = list(range(0, n_frames - window + 1, stride))
    if starts[-1] != n_frames - window:
        starts.append(n_frames - window)
    return np.stack([np.arange(s, s + window) for s in starts])
