"""Golden token-id fixtures for the CLIP BPE tokenizer (VERDICT r4 item 3).

The real bpe_simple_vocab_16e6.txt.gz cannot be downloaded here (zero
egress), but the published CLIP vocab LAYOUT fixes many ids without it:

  vocab = [256 byte symbols | 256 byte+'</w>' | 48894 merges | sot | eot]

so every single-character token id is layout-determined — 'a</w>' is
256 + index_of(97) = 320 (the well-known id of "a"), digits split one id
per character, sot/eot are 49406/49407. Those are asserted against a
FULL-SIZE vocab whose merge entries never fire (multi-char dummy pairs),
which also pins the loader's slice arithmetic (tokenizer.py:60-78 mirrors
open_clip's merges[1:49152-256-2+1]).

Multi-char word ids (photo=1125, cat=2368, ...) from the published CLIP
README example are gated behind the real vocab file: set GEO4D_BPE_PATH
or drop the file at checkpoints/bpe_simple_vocab_16e6.txt.gz and the
golden test runs (real-weights-day gate).
"""

import gzip
import os

import numpy as np
import pytest

from geo4d_tpu.data.tokenizer import (
    CLIPTokenizer,
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    bytes_to_unicode,
)

pytestmark = pytest.mark.smoke

SOT, EOT = VOCAB_SIZE - 2, VOCAB_SIZE - 1


def _char_id(ch: str, end_of_word: bool) -> int:
    """Layout-determined id of a single-character token."""
    table = bytes_to_unicode()
    sym = table[ch.encode("utf-8")[0]]
    idx = list(table.values()).index(sym)
    return idx + (256 if end_of_word else 0)


@pytest.fixture(scope="module")
def full_dummy_vocab(tmp_path_factory):
    """Full-size vocab file whose merges can never apply to test prompts
    (multi-char left elements), putting sot/eot at the REAL 49406/49407."""
    # open_clip slice merges[1:49152-256-2+1] keeps 48894 merge lines;
    # 512 byte symbols + 48894 + 2 specials = 49408
    n_merges = 48894
    lines = ["bpe_simple_vocab_16e6 dummy"]
    lines += [f"qq{i} zz{i}" for i in range(n_merges)]
    path = tmp_path_factory.mktemp("bpe") / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return str(path)


def test_dummy_vocab_reaches_full_size(full_dummy_vocab):
    tok = CLIPTokenizer(full_dummy_vocab)
    assert tok.has_vocab
    assert len(tok.encoder) == VOCAB_SIZE
    assert tok.encoder["<start_of_text>"] == SOT
    assert tok.encoder["<end_of_text>"] == EOT


def test_single_char_golden_ids(full_dummy_vocab):
    """Layout-determined REAL ids: 'a' -> 320 (the published CLIP id),
    '!' -> 256, digits one id per char."""
    tok = CLIPTokenizer(full_dummy_vocab)
    assert _char_id("a", True) == 320
    np.testing.assert_array_equal(
        tok(["a"])[0][:3], [SOT, 320, EOT]
    )
    np.testing.assert_array_equal(
        tok(["!"])[0][:3], [SOT, 256, EOT]
    )
    # CLIP tokenizes numbers one DIGIT at a time (\p{N}, not \p{N}+), and
    # each regex token is an independent BPE word -> each digit ends a
    # word: '123' -> ['1</w>', '2</w>', '3</w>'] = [272, 273, 274]
    ids = tok(["123"])[0]
    expect = [SOT, _char_id("1", True), _char_id("2", True),
              _char_id("3", True), EOT]
    np.testing.assert_array_equal(ids[:5], expect)
    assert ids[5] == 0  # zero padding


def test_word_then_punct_split(full_dummy_vocab):
    """'a!' splits into two regex tokens, each an independent BPE word
    (so both carry the </w> marker): ['a</w>'=320, '!</w>'=256]."""
    tok = CLIPTokenizer(full_dummy_vocab)
    ids = tok(["a!"])[0]
    np.testing.assert_array_equal(
        ids[:4], [SOT, _char_id("a", True), _char_id("!", True), EOT]
    )


def test_truncation_matches_openclip(full_dummy_vocab):
    """open_clip.tokenize truncates to 77 and forces EOT last."""
    tok = CLIPTokenizer(full_dummy_vocab)
    ids = tok(["a " * 100])[0]
    assert ids.shape == (CONTEXT_LENGTH,)
    assert ids[0] == SOT
    np.testing.assert_array_equal(ids[1:76], [320] * 75)
    assert ids[76] == EOT


def test_merge_priority(tmp_path):
    """BPE merge order: lowest-rank pair first (tokenizer cache off-path)."""
    vocab = "header\nh e\nhe l\n"
    p = tmp_path / "bpe.txt"
    p.write_text(vocab)
    tok = CLIPTokenizer(str(p))
    # 'hel' -> (h, e, l</w>) -> merge (h,e) -> (he, l</w>); ('he','l</w>')
    # is not a merge entry, so it stops: ids = [he=512, l</w>]
    out = tok._bpe("hel").split(" ")
    assert out == ["he", "l</w>"]
    # 'hell' -> (he, l, l</w>) -> ('he','l') rank-1 merge -> (hel, l</w>)
    out = tok._bpe("hell").split(" ")
    assert out == ["hel", "l</w>"]


REAL_VOCAB_CANDIDATES = [
    os.environ.get("GEO4D_BPE_PATH", ""),
    os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                 "bpe_simple_vocab_16e6.txt.gz"),
]


def _real_vocab():
    for p in REAL_VOCAB_CANDIDATES:
        if p and os.path.exists(p):
            return p
    return None


@pytest.mark.skipif(_real_vocab() is None,
                    reason="real CLIP BPE vocab not present (zero-egress "
                           "env); runs on real-assets day")
def test_real_vocab_golden_multichar():
    """Published CLIP README tokenization: 'a photo of a cat' ->
    [49406, 320, 1125, 539, 320, 2368, 49407]; 'a diagram'/'a dog'/'a cat'
    -> 22697 / 1929 / 2368 (openai/CLIP README + open_clip tests)."""
    tok = CLIPTokenizer(_real_vocab())
    np.testing.assert_array_equal(
        tok(["a photo of a cat"])[0][:7],
        [SOT, 320, 1125, 539, 320, 2368, EOT],
    )
    np.testing.assert_array_equal(tok(["a diagram"])[0][:4],
                                  [SOT, 320, 22697, EOT])
    np.testing.assert_array_equal(tok(["a dog"])[0][:4],
                                  [SOT, 320, 1929, EOT])
    np.testing.assert_array_equal(tok(["a cat"])[0][:4],
                                  [SOT, 320, 2368, EOT])
