"""Automated ASAN/UBSAN pass over the native C++ components.

Builds native/sanitize_harness.cpp (+ decoder + rasterizer) with
-fsanitize=address,undefined via native/sanitize_check.sh and runs the
corruption / degenerate-geometry cases against a synthetic video, then
cross-checks the harness's decode CHECKSUM line against an independent
cv2 decode of the same file — so both *rejection of bad inputs* and
*correctness of good decodes* are asserted under the sanitizers.

VERDICT r3 item 8: the harness existed but nothing ran it; this test is
the automation (skipped cleanly where g++/ffmpeg-dev are absent).
"""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~30 s compile + run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def _toolchain_available():
    if shutil.which("g++") is None or shutil.which("pkg-config") is None:
        return False
    rc = subprocess.run(
        ["pkg-config", "--exists", "libavformat", "libavcodec",
         "libavutil", "libswscale"],
    ).returncode
    return rc == 0


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("sanvid") / "san.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 64))
    yy, xx = np.mgrid[:64, :96].astype(np.float32)
    for i in range(12):
        frame = np.stack(
            [xx * 2 + i * 7, yy * 3, (xx + yy) * 1.5], axis=-1
        ).clip(0, 255).astype(np.uint8)
        writer.write(frame)
    writer.release()
    return path


@pytest.mark.skipif(
    not _toolchain_available(),
    reason="g++ or ffmpeg dev headers unavailable",
)
def test_sanitize_harness_end_to_end(synthetic_video):
    import cv2

    proc = subprocess.run(
        ["bash", os.path.join(NATIVE, "sanitize_check.sh"), synthetic_video],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"sanitize harness failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "all cases passed" in proc.stdout

    # decode-correctness: compare the harness's per-channel means (48x32
    # decode, RGB) with an independent cv2 decode+resize of the same file
    m = re.search(
        r"CHECKSUM n=(\d+) mean_rgb=([\d.]+),([\d.]+),([\d.]+)", proc.stdout
    )
    assert m, f"no CHECKSUM line in harness output:\n{proc.stdout}"
    n_frames = int(m.group(1))
    means_native = np.array([float(m.group(i)) for i in (2, 3, 4)])

    cap = cv2.VideoCapture(synthetic_video)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        f = cv2.resize(f, (48, 32))
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    assert n_frames == len(frames)
    means_ref = np.stack(frames).astype(np.float64).reshape(-1, 3).mean(axis=0)
    # different scalers (swscale vs cv2), same codec: means agree closely
    assert np.abs(means_native - means_ref).max() < 3.0, (
        f"native decode means {means_native} vs cv2 {means_ref}"
    )
