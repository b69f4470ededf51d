"""Profiling/tracing utilities.

Parity surface: the reference's observability is wall-clock stage timing
dumped to time_cost.txt (infer_geo4d.py:437-463,640-648). Here that stays
(pipeline/export.save_time_cost) and is extended with real device traces:
`trace()` wraps jax.profiler for TensorBoard-viewable TPU traces, and
`StageTimer` collects named stage durations with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named stage wall-times with device synchronization at boundaries."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """`sync` is an optional array/pytree to block_until_ready on exit."""
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def summary(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k}: {v:.3f}s ({100*v/max(total,1e-9):.0f}%)"
                 for k, v in self.stages.items()]
        return " | ".join(lines)
