"""Training observability: metric logging, sample logging, device stats.

Parity targets: reference main/callbacks.py — `ImageLogger` (:15-101:
periodic sample grids to tensorboard + local mp4) and `CUDACallback`
(:104-132: epoch wall-time + peak device memory, reduced across ranks).
TPU equivalents: JSONL metric stream (greppable, no TB dependency),
mp4 sample grids via data/save_video.py, and device memory stats from
jax's memory_stats() (the XLA arena's live/peak bytes).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    """Append-only JSONL metrics + optional console echo."""

    def __init__(self, log_dir: str, echo_every: int = 50):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.echo_every = echo_every
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any]):
        row = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            row[k] = float(v) if hasattr(v, "__float__") else v
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.echo_every and step % self.echo_every == 0:
            print(f"[train] step {step}: " + " ".join(
                f"{k}={row[k]:.5g}" if isinstance(row[k], float) else f"{k}={row[k]}"
                for k in metrics
            ))


class SampleLogger:
    """Periodic decoded-sample mp4 grids (ImageLogger parity)."""

    def __init__(self, log_dir: str, every: int = 1000, fps: int = 8):
        self.dir = os.path.join(log_dir, "samples")
        os.makedirs(self.dir, exist_ok=True)
        self.every = every
        self.fps = fps

    def maybe_log(self, step: int, videos):
        """videos: list of (T, H, W, 3) arrays in [-1, 1]."""
        if step % self.every:
            return None
        from geo4d_tpu.data.save_video import save_video_grid

        path = os.path.join(self.dir, f"step_{step:08d}.mp4")
        return save_video_grid(path, [np.asarray(v) for v in videos], self.fps)


def device_memory_stats() -> Dict[str, float]:
    """Peak/live HBM bytes per device (CUDACallback's peak-memory parity)."""
    import jax

    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            out[f"dev{i}_bytes_in_use"] = s.get("bytes_in_use", 0)
            out[f"dev{i}_peak_bytes"] = s.get("peak_bytes_in_use", 0)
    return out


class EpochTimer:
    """Epoch wall-time + throughput (CUDACallback parity)."""

    def __init__(self):
        self._start: Optional[float] = None
        self._samples = 0

    def start(self):
        self._start = time.time()
        self._samples = 0

    def step(self, batch_size: int):
        self._samples += batch_size

    def finish(self) -> Dict[str, float]:
        dt = time.time() - (self._start or time.time())
        return {
            "epoch_seconds": dt,
            "samples_per_sec": self._samples / dt if dt > 0 else 0.0,
            **device_memory_stats(),
        }
