"""CLIP BPE tokenizer (OpenCLIP-compatible), self-contained.

The reference tokenizes prompts with `open_clip.tokenize`
(lvdm/modules/encoders/condition.py:214) — a byte-pair tokenizer over the
standard CLIP vocabulary (bpe_simple_vocab_16e6.txt.gz, 49408 entries) with
<start_of_text>/<end_of_text> specials, padded/truncated to 77 tokens.

This is the same algorithm implemented from the BPE definition. The merge
table ships with the model assets (alongside the checkpoint); when absent, a
deterministic hash fallback keeps the pipeline runnable with random weights
(conditioning is then meaningless but shape-correct — fine for perf work).
"""

from __future__ import annotations

import gzip
import html
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408

# OpenCLIP SimpleTokenizer word pattern (tokenizer.py):
#   <specials> | contractions | \p{L}+ | \p{N} | [^\s\p{L}\p{N}]+
# Python-re equivalents: [^\W\d_]+ for \p{L}+, \d for a SINGLE digit
# (CLIP tokenizes "123" as three tokens), (?:[^\s\w]|_)+ for the
# punctuation class (underscore is not \p{L}).
_TOKEN_RE = re.compile(
    r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|(?:[^\s\w]|_)+",
    re.IGNORECASE,
)


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte <-> unicode table (the standard BPE byte encoder)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPTokenizer:
    def __init__(self, bpe_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.bpe_ranks: Dict[Tuple[str, str], int] = {}
        self.encoder: Dict[str, int] = {}
        self.has_vocab = False
        if bpe_path and os.path.exists(bpe_path):
            self._load_vocab(bpe_path)

    def _load_vocab(self, path: str):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        # standard CLIP vocab layout: header line, then 48894 merges
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self.has_vocab = True

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)

        def get_pairs(word):
            return {(word[i], word[i + 1]) for i in range(len(word) - 1)}

        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_text(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        text = re.sub(r"\s+", " ", text)
        ids: List[int] = []
        for token in _TOKEN_RE.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def _hash_fallback(self, text: str) -> List[int]:
        # deterministic shape-correct stand-in when no vocab file is present
        words = re.findall(r"\S+", text.lower())
        return [(hash(w) % (VOCAB_SIZE - 3)) + 1 for w in words]

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        """Tokenize to (B, 77) int32 with SOT/EOT and zero padding."""
        if isinstance(texts, str):
            texts = [texts]
        sot, eot = VOCAB_SIZE - 2, VOCAB_SIZE - 1
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode_text(t) if self.has_vocab else self._hash_fallback(t)
            ids = [sot] + ids[: context_length - 2] + [eot]
            out[i, : len(ids)] = ids
        return out
