"""Data layer tests: native + cv2 video decode parity, tokenizer, metadata."""

import os

import numpy as np
import pytest

from geo4d_tpu.data.datasets import (
    BONN_SEQS,
    DATASET_FPS,
    DATASET_RESOLUTION,
    SINTEL_POSE_SEQS,
)
from geo4d_tpu.data.tokenizer import CLIPTokenizer, VOCAB_SIZE
from geo4d_tpu.data.video import (
    _load_native,
    _load_video_native,
    load_video,
    sliding_windows,
)


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48)
    )
    # smooth gradient content: scaler differences (swscale bilinear vs cv2)
    # stay small, unlike high-frequency noise
    yy, xx = np.mgrid[:48, :64].astype(np.float32)
    for i in range(20):
        frame = np.stack(
            [xx * 3 + i * 5, yy * 4, (xx + yy) * 2], axis=-1
        ).clip(0, 255).astype(np.uint8)
        writer.write(frame)
    writer.release()
    return path


def test_native_decoder_loads(synthetic_video):
    assert _load_native(), "native decoder library missing — run native/build.sh"
    arr, fps = _load_video_native(synthetic_video, 1, (24, 32), -1)
    assert arr.shape == (20, 24, 32, 3)
    assert -1.0 <= arr.min() and arr.max() <= 1.0
    assert fps == 24


def test_native_matches_cv2(synthetic_video):
    import cv2

    arr_native, _ = _load_video_native(synthetic_video, 1, (24, 32), 8)
    # cv2 reference decode
    cap = cv2.VideoCapture(synthetic_video)
    frames = []
    while len(frames) < 8:
        ok, f = cap.read()
        if not ok:
            break
        f = cv2.resize(f, (32, 24))
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    ref = (np.stack(frames).astype(np.float32) / 255.0 - 0.5) * 2.0
    # same codec output, different scalers: allow small interpolation diff
    assert arr_native.shape == ref.shape
    assert np.abs(arr_native - ref).mean() < 0.05


def test_load_video_stride_and_pad(synthetic_video):
    arr, fps = load_video(synthetic_video, frame_stride=2, video_size=(24, 32))
    assert arr.shape[0] == 10
    assert fps == 12
    arr, _ = load_video(
        synthetic_video, frame_stride=1, video_size=(24, 32), max_frames=30
    )
    assert arr.shape[0] == 30  # padded by last frame
    assert np.array_equal(arr[-1], arr[19])


def test_tokenizer_fallback_shapes():
    tok = CLIPTokenizer(None)
    out = tok(["a photo of a cat", ""])
    assert out.shape == (2, 77)
    assert out[0, 0] == VOCAB_SIZE - 2  # SOT
    assert (out[0] == VOCAB_SIZE - 1).sum() == 1  # one EOT
    assert out.dtype == np.int32


def test_tokenizer_with_tiny_vocab(tmp_path):
    # minimal merge table exercising the real BPE path
    vocab = "version\nh e\nhe l\nhel l\nhell o</w>\n"
    p = tmp_path / "bpe.txt"
    p.write_text(vocab)
    tok = CLIPTokenizer(str(p))
    assert tok.has_vocab
    ids = tok(["hello"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == VOCAB_SIZE - 2


def test_dataset_registry():
    assert DATASET_RESOLUTION["sintel"] == (576, 256)
    assert DATASET_RESOLUTION["kitti"] == (640, 192)
    assert DATASET_FPS["kitti"] == 10
    assert len(SINTEL_POSE_SEQS) == 14
    assert len(BONN_SEQS) == 5
