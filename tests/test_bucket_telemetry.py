"""Compile-bucket telemetry + executable reuse across sequence lengths.

The aligner pads (G, N) up to bucket multiples so a multi-sequence eval
compiles its phase scans once per BUCKET, not once per sequence
(alignment/optimizer.py:28-33). VERDICT r4 item 8: make that observable —
one log line per new bucket — and prove two different-length sequences
inside one bucket share the jitted executable (jax cache size unchanged).
"""

import logging

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

H, W, S = 8, 12, 4


def _build(n_frames, seed=0):
    import jax

    from geo4d_tpu.alignment.optimizer import AlignerConfig, GroupAligner

    rng = np.random.default_rng(seed)
    starts = list(range(0, n_frames - S + 1, 2))
    groups = np.stack([np.arange(s, s + S) for s in starts])
    G = groups.shape[0]
    pred = rng.normal(size=(G, S, H * W, 3)).astype(np.float32)
    conf = rng.uniform(0.5, 1.5, (G, S, H * W)).astype(np.float32)
    cfg = AlignerConfig(n_iter=4, depth_traj_start_iter=2,
                        bucket_groups=4, bucket_frames=8)
    with jax.default_device(jax.devices("cpu")[0]):
        al = GroupAligner(groups, pred, conf, (H, W), config=cfg)
    return al


def test_bucket_log_lines(caplog):
    """One INFO line per aligner, flagged NEW vs reused."""
    import geo4d_tpu.alignment.optimizer as opt

    opt._SEEN_BUCKETS.clear()
    with caplog.at_level(logging.INFO, logger="geo4d_tpu.alignment"):
        _build(8)   # G=3 -> Gp=4, N=8 -> Np=8
        _build(8, seed=1)
    lines = [r.message for r in caplog.records if "aligner bucket" in r.message]
    assert len(lines) == 2
    assert "NEW this process" in lines[0]
    assert "reused" in lines[1]


def test_same_bucket_shares_executable():
    """Sequences of different length inside one bucket pad to identical
    shapes and REUSE one compiled phase scan: jax's jit cache for
    _run_phase does not grow on the second run."""
    import jax

    from geo4d_tpu.alignment.optimizer import _run_phase

    al6 = _build(6)    # N=6 -> Np=8, G=2 -> Gp=4
    al8 = _build(8)    # N=8 -> Np=8, G=3 -> Gp=4
    assert al6.bucket_key() == al8.bucket_key()

    with jax.default_device(jax.devices("cpu")[0]):
        al6.run()
        size_after_first = _run_phase._cache_size()
        al8.run()
        assert _run_phase._cache_size() == size_after_first

    # a genuinely different bucket DOES add executables
    al16 = _build(14)  # Np=16 -> new bucket
    assert al16.bucket_key() != al8.bucket_key()
    with jax.default_device(jax.devices("cpu")[0]):
        al16.run()
    assert _run_phase._cache_size() > size_after_first
