"""Tokenization for the sentence encoder.

The reference delegates tokenization to sentence-transformers' bundled HF
tokenizers (``Tool/Sentence_Embedding.py:75-150``). This build runs in a
zero-egress environment, so the default is a deterministic hashing word
tokenizer: lowercase, split on non-alphanumerics, hash each token into a
fixed-size id space. It needs no vocabulary file, is stable across runs, and
gives the encoder a dense, trainable embedding table. A HuggingFace tokenizer
is used instead when one is available locally (``from_pretrained`` with
``local_files_only=True``).
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# ASCII-only lowercasing, NOT str.lower(): the C++ kernels lowercase bytes
# A-Z and treat every non-ASCII byte as a separator, while str.lower() maps
# some non-ASCII chars INTO ASCII (U+212A KELVIN SIGN -> 'k', U+0130 -> 'i'
# + combining dot), which would tokenize differently on the two paths. With
# this table the Python and native token streams are identical for ALL
# inputs: ASCII uppercase lowers on both, and any non-ASCII char (one char
# here, >= 1 non-alnum bytes there) is a separator on both.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

# the native tokenizers cap a single token at 256 bytes before hashing /
# piece-matching; tokens are ASCII alnum by construction, so chars == bytes
_MAX_TOKEN_CHARS = 256

PAD_ID = 0
CLS_ID = 1
UNK_ID = 2
_N_SPECIAL = 3

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = (1 << 64) - 1


def _hash_token(token: str, vocab_size: int) -> int:
    """FNV-1a 64-bit — bit-identical to the C++ fast path
    (native/semsearch_native.cpp)."""
    h = _FNV_OFFSET
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _U64
    return _N_SPECIAL + (h % (vocab_size - _N_SPECIAL))


@dataclass
class HashingTokenizer:
    """Deterministic hashing tokenizer with static-length padding."""

    vocab_size: int = 30522
    max_len: int = 256
    add_cls: bool = True

    def tokenize(self, text: str) -> List[str]:
        return [t[:_MAX_TOKEN_CHARS]
                for t in _TOKEN_RE.findall(text.translate(_ASCII_LOWER))]

    def encode(self, text: str, max_len: int | None = None) -> List[int]:
        ids = [_hash_token(t, self.vocab_size) for t in self.tokenize(text)]
        if self.add_cls:
            ids = [CLS_ID] + ids
        return ids[: self.max_len if max_len is None else max_len]

    def encode_batch(
        self, texts: Sequence[str], max_len: int | None = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids, mask), both (B, L) with static L = max_len.

        Uses the C++ FNV-1a tokenizer (native/semsearch_native.cpp) when
        built — bit-identical ids — and this Python path otherwise.
        """
        L = max_len or self.max_len
        try:
            from ..native import hash_tokenize_batch

            native = hash_tokenize_batch(texts, self.vocab_size, L, self.add_cls)
        except (ImportError, OSError):  # unavailable, not broken: fallback
            native = None
        if native is not None:
            return native
        ids = np.full((len(texts), L), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            # honor the CALL's length, not self.max_len — the native kernel
            # truncates at L, and the two paths must agree when L > default
            enc = self.encode(text, max_len=L)
            ids[i, : len(enc)] = enc
            mask[i, : len(enc)] = 1
        return ids, mask


def load_tokenizer(
    name_or_path: str | None = None,
    vocab_size: int = 30522,
    max_len: int = 256,
):
    """Resolve a tokenizer: a trained subword JSON (``.json`` path — see
    ``models/subword.py``), a local HF tokenizer directory, or the hashing
    fallback."""
    if name_or_path and name_or_path.endswith(".json"):
        import os

        if os.path.exists(name_or_path):
            from .subword import SubwordTokenizer

            tok = SubwordTokenizer.load(name_or_path)
            tok.max_len = max_len
            return tok
    if name_or_path:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(name_or_path, local_files_only=True)

            class _HFAdapter:
                def __init__(self, hf, max_len):
                    self.hf = hf
                    self.max_len = max_len
                    self.vocab_size = hf.vocab_size

                def encode_batch(self, texts, max_len=None):
                    L = max_len or self.max_len
                    out = self.hf(
                        list(texts),
                        padding="max_length",
                        truncation=True,
                        max_length=L,
                        return_tensors="np",
                    )
                    return (
                        out["input_ids"].astype(np.int32),
                        out["attention_mask"].astype(np.int32),
                    )

            return _HFAdapter(tok, max_len)
        except Exception:
            pass
    return HashingTokenizer(vocab_size=vocab_size, max_len=max_len)
