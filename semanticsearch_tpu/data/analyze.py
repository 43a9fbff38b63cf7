"""Corpus and chunk-output statistics.

Ports the reference analyzers (``data_process/analyze_document_lengths.py``,
``analyze_chunks.py``): per-document word/sentence stats with distribution
percentiles and length buckets; per-chunk stats with duplicate ratio and
vocabulary/type-token diagnostics. These double as data-quality regression
checks (SURVEY.md §4: "data-quality reports as tests").
"""
from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..chunking.segmenter import extract_sentences
from .tsv import read_tsv

_BUCKETS = [(0, 100), (100, 250), (250, 500), (500, 1000),
            (1000, 2500), (2500, 5000), (5000, 10**12)]


def _stats(arr: List[float]) -> Dict[str, float]:
    if not arr:
        return {"count": 0}
    a = np.asarray(arr, dtype=np.float64)
    return {
        "count": int(a.size),
        "mean": float(a.mean()),
        "median": float(np.median(a)),
        "min": float(a.min()),
        "max": float(a.max()),
        "p10": float(np.percentile(a, 10)),
        "p90": float(np.percentile(a, 90)),
        "std": float(a.std()),
    }


def analyze_documents(
    tsv_path: str,
    text_column: str = "document",
    limit: Optional[int] = None,
    count_sentences: bool = True,
) -> Dict:
    """Word/sentence stats over a 5-column corpus TSV."""
    words: List[float] = []
    sents: List[float] = []
    buckets = Counter()
    for row in read_tsv(tsv_path, limit=limit):
        text = row.get(text_column, "")
        w = len(text.split())
        words.append(w)
        if count_sentences:
            sents.append(len(extract_sentences(text)))
        for lo, hi in _BUCKETS:
            if lo <= w < hi:
                buckets[f"{lo}-{hi if hi < 10**12 else 'inf'}"] += 1
                break
    out = {
        "word_count_stats": _stats(words),
        "length_buckets": dict(buckets),
    }
    if count_sentences:
        out["sentence_count_stats"] = _stats(sents)
        total_words = sum(words)
        total_sents = sum(sents)
        out["avg_words_per_sentence_overall"] = (
            total_words / total_sents if total_sents else 0.0
        )
    return out


def analyze_chunks(
    tsv_path: str,
    text_column: str = "chunk_text",
    limit: Optional[int] = None,
) -> Dict:
    """Chunk-output stats: per-(query,doc) counts, duplicates, vocab/TTR."""
    chunk_words: List[float] = []
    chunk_chars: List[float] = []
    per_pair = Counter()
    seen_texts = Counter()
    vocab = Counter()
    n = 0
    for row in read_tsv(tsv_path, limit=limit):
        text = row.get(text_column, "")
        n += 1
        chunk_words.append(len(text.split()))
        chunk_chars.append(len(text))
        key = (row.get("query_id", ""), row.get("document_id", ""))
        per_pair[key] += 1
        seen_texts[text] += 1
        vocab.update(re.findall(r"[a-z0-9]+", text.lower()))
    dup_rows = sum(c - 1 for c in seen_texts.values() if c > 1)
    total_tokens = sum(vocab.values())
    return {
        "chunks": n,
        "word_stats": _stats(chunk_words),
        "char_stats": _stats(chunk_chars),
        "chunks_per_pair": _stats(list(map(float, per_pair.values()))),
        "duplicate_ratio": dup_rows / n if n else 0.0,
        "vocab_size": len(vocab),
        "type_token_ratio": len(vocab) / total_tokens if total_tokens else 0.0,
    }


def save_report(report: Dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
