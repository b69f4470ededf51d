#!/usr/bin/env bash
# Pre-snapshot gate: nothing ships with a red smoke tier or a broken
# native decoder again (round-3 lesson: the uint8-ingest change landed
# with 2 stale smoke tests at HEAD).
#
# Runs in <10 min on a CPU host:
#   1. pytest -m smoke      — the fast CPU-light tier
#   2. native sanitize_check — ASAN/UBSAN harness over the C++ decoder
#      and rasterizer (skipped with a warning if g++/ffmpeg-dev missing)
#   3. README perf block must match the newest BENCH_r*.json (round-3 AND
#      round-4 both shipped a stale frames/s quote — now structural)
#
# Usage: bash scripts/preflight.sh   (exit 0 = safe to snapshot)
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0

echo "== preflight 1/3: smoke test tier =="
if ! JAX_PLATFORMS=cpu python -m pytest tests/ -m smoke -q; then
    echo "PREFLIGHT FAIL: smoke tier is red"
    fail=1
fi

echo "== preflight 2/3: native sanitizer harness =="
if command -v g++ >/dev/null && pkg-config --exists libavformat 2>/dev/null; then
    if ! bash native/sanitize_check.sh; then
        echo "PREFLIGHT FAIL: sanitize_check failed"
        fail=1
    fi
else
    echo "WARN: g++ or ffmpeg dev headers missing — sanitizer skipped"
fi

echo "== preflight 3/3: README vs newest BENCH artifact =="
if ! python scripts/update_readme_bench.py --check; then
    echo "PREFLIGHT FAIL: README perf block is stale"
    fail=1
fi

if [ "$fail" -eq 0 ]; then
    echo "PREFLIGHT OK"
else
    echo "PREFLIGHT FAILED — do not snapshot"
fi
exit "$fail"
