"""Video-grid saving (parity: reference utils/save_video.py:27-117
`save_video_grid` + tensor2mp4 used by the training ImageLogger)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def frames_to_mp4(path: str, frames: np.ndarray, fps: int = 8):
    """(T, H, W, 3) float [-1,1] or uint8 -> mp4 via OpenCV (C++ FFmpeg)."""
    import cv2

    if frames.dtype != np.uint8:
        frames = ((np.clip(frames, -1, 1) + 1) / 2 * 255).astype(np.uint8)
    t, h, w = frames.shape[:3]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for i in range(t):
        writer.write(cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def save_video_grid(path: str, videos: Sequence[np.ndarray], fps: int = 8,
                    ncols: int = 4):
    """Tile a batch of (T, H, W, 3) videos into one grid mp4."""
    videos = [np.asarray(v) for v in videos]
    t, h, w = videos[0].shape[:3]
    n = len(videos)
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((t, nrows * h, ncols * w, 3), videos[0].dtype)
    for i, v in enumerate(videos):
        r, c = divmod(i, ncols)
        grid[:, r * h : (r + 1) * h, c * w : (c + 1) * w] = v[:t]
    return frames_to_mp4(path, grid, fps)
