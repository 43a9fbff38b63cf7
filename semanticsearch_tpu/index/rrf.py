"""Reciprocal-rank fusion of score lists.

Semantics mirror the reference exactly (``Tool/rank_chunks_optimized.py:225-239``):
rank 1 = highest score, ties broken by position in ``np.argsort(-scores)``
order, fused as ``sum_i 1 / (k + rank_i)`` with k=60.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def ranks_from_scores(scores: np.ndarray) -> np.ndarray:
    """1-based competition-free ranks: position in descending-score order."""
    order = np.argsort(-scores, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    return ranks


def rrf_fuse(score_lists: Sequence[np.ndarray], k: int = 60) -> np.ndarray:
    """Fuse N score arrays over the same candidates into one RRF score array."""
    if not score_lists:
        raise ValueError("need at least one score list")
    out = np.zeros(len(score_lists[0]), dtype=np.float64)
    for scores in score_lists:
        out += 1.0 / (k + ranks_from_scores(np.asarray(scores)))
    return out
