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

pytestmark = pytest.mark.smoke  # CPU-light fast tier
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
    # contract: the private loader returns raw uint8 (0..255); the public
    # load_video normalizes (or passes uint8 through with raw_uint8=True).
    assert _load_native(), "native decoder library missing — run native/build.sh"
    arr, fps = _load_video_native(synthetic_video, 1, (24, 32), -1)
    assert arr.shape == (20, 24, 32, 3)
    assert arr.dtype == np.uint8
    assert fps == 24
    # the under-filled decode buffer must not be pinned by a view
    assert arr.base is None or arr.base.shape[0] == arr.shape[0]
    # public API still yields [-1,1] floats by default
    norm, _ = load_video(synthetic_video, 1, (24, 32))
    assert norm.dtype == np.float32
    assert -1.0 <= norm.min() and norm.max() <= 1.0


def test_native_matches_cv2(synthetic_video):
    import cv2

    arr_native, _ = _load_video_native(synthetic_video, 1, (24, 32), 8)
    assert arr_native.dtype == np.uint8
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
    native_norm = (arr_native.astype(np.float32) / 255.0 - 0.5) * 2.0
    # same codec output, different scalers: allow small interpolation diff
    assert native_norm.shape == ref.shape
    assert np.abs(native_norm - ref).mean() < 0.05


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


def test_batched_random_sampler_semantics():
    """Epoch-seeded, rank-sharded, feature-pooled sampling
    (lvdm/data/batched_sampler.py:21-69 parity)."""
    from geo4d_tpu.data.sampler import BatchedRandomSampler, epoch_plan

    n, bs, pool, ws = 23, 4, 3, 2
    # same epoch -> identical plan; different epoch -> different
    p1 = epoch_plan(n, bs, pool, epoch=5, world_size=ws)
    p2 = epoch_plan(n, bs, pool, epoch=5, world_size=ws)
    p3 = epoch_plan(n, bs, pool, epoch=6, world_size=ws)
    assert (p1 == p2).all()
    assert (p1 != p3).any()
    # drop_last: total rounded down to a multiple of bs*ws
    assert len(p1) == (n // (bs * ws)) * bs * ws == 16
    # each consecutive batch shares one feat idx, drawn from the pool
    feats = p1[:, 1].reshape(-1, bs)
    assert (feats == feats[:, :1]).all()
    assert (p1[:, 1] < pool).all()
    # sample indices are distinct (a shuffle, not a draw)
    assert len(set(p1[:, 0].tolist())) == len(p1)

    # ranks partition the plan disjointly and batch-aligned
    s0 = BatchedRandomSampler(n, bs, pool, world_size=ws, rank=0)
    s1 = BatchedRandomSampler(n, bs, pool, world_size=ws, rank=1)
    s0.set_epoch(5)
    s1.set_epoch(5)
    r0, r1 = list(s0), list(s1)
    assert len(r0) == len(r1) == len(s0) == 8
    assert [t[0] for t in r0] + [t[0] for t in r1] == p1[:, 0].tolist()

    # non-distributed + drop_last=False wraps the tail modulo n
    pf = epoch_plan(n, bs, pool, epoch=1, drop_last=False)
    assert len(pf) == n and (pf[:, 0] < n).all()


def test_npz_stream_deterministic_epoch_order(tmp_path):
    """npz_stream batches follow the epoch plan, deterministically."""
    from geo4d_tpu.cli.train import npz_stream

    t, hw = 2, 4
    for i in range(5):
        np.savez(
            tmp_path / f"clip_{i}.npz",
            video=np.full((t, hw, hw, 3), i, np.float32),
            normed_allpts=np.zeros((t, hw, hw, 3), np.float32),
            plucker_raymap=np.zeros((t, hw, hw, 3), np.float32),
            plucker_cross=np.zeros((t, hw, hw, 3), np.float32),
            inverse_depth=np.zeros((t, hw, hw, 1), np.float32),
            fps=24,
        )

    def first_ids(stream, n_batches=2):
        out = []
        for _ in range(n_batches):
            b = next(stream)
            out.append([int(v[0, 0, 0, 0]) for v in b["video"]])
        return out

    a = first_ids(npz_stream(str(tmp_path), 2, t))
    b = first_ids(npz_stream(str(tmp_path), 2, t))
    assert a == b  # same epoch seed -> same order
    c = first_ids(npz_stream(str(tmp_path), 2, t, start_epoch=1))
    assert a != c  # next epoch reshuffles


def test_datamodule_loader_semantics():
    """DataModule parity (main/utils_data_eval.py): per-split loaders,
    multi-resolution pool batching, test_max_n_samples subsetting,
    prefetch-thread delivery, iterable worker sharding."""
    from geo4d_tpu.data.loader import (
        DataModule,
        Prefetcher,
        default_collate,
        shard_iterable,
    )

    class Toy:
        _resolutions = [(32, 32), (64, 32)]

        def __len__(self):
            return 11

        def __getitem__(self, idx):
            return {"x": np.full((2, 2), idx, np.float32), "i": idx}

    dm = DataModule(batch_size=2, train=Toy(), test=Toy(),
                    multi_resolution=True, test_max_n_samples=5).setup()

    batches = list(dm.train_dataloader(epoch=3))
    # drop_last over 11 samples at bs 2 -> 5 batches
    assert len(batches) == 5
    assert batches[0]["x"].shape == (2, 2, 2)
    seen = sorted(int(i) for b in batches for i in b["i"])
    assert len(set(seen)) == 10  # a shuffle of 10 distinct samples
    # deterministic in epoch
    again = list(dm.train_dataloader(epoch=3))
    assert all((a["x"] == b["x"]).all() for a, b in zip(batches, again))
    other = list(dm.train_dataloader(epoch=4))
    assert any((a["x"] != b["x"]).any() for a, b in zip(batches, other))

    # test loader: subset to 5 -> 2 batches
    assert len(list(dm.test_dataloader())) == 2

    # collate handles tuples/scalars/strings
    out = default_collate([(1, "a"), (2, "b")])
    assert out[0].tolist() == [1, 2] and out[1] == ["a", "b"]

    # prefetcher propagates errors
    def boom():
        yield 1
        raise RuntimeError("boom")

    it = Prefetcher(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)

    # iterable worker sharding covers all ids disjointly
    class It:
        valid_ids = list(range(10))

        def __len__(self):
            return 10

    shards = [shard_iterable(It(), w, 3) for w in range(3)]
    flat = [i for s in shards for i in s]
    assert sorted(flat) == list(range(10))
