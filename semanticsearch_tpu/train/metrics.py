"""IR evaluation metrics: MAP, MRR, AP, P@k, DCG@k, NDCG@k.

The same 18-metric task the reference evaluates
(``MatchZoo_Tool/evaluate_models.py:213-241``): MAP, MRR, AP, P@{1,3,5,10,20},
NDCG@{1,3,5,10,20}, DCG@{1,3,5,10,20}. Definitions follow MatchZoo-py's
metric classes: relevance threshold 0 (labels > 0 count as relevant), DCG gain
``2^rel - 1`` gated on ``rel > threshold`` with a NATURAL-log ``ln(rank + 1)``
discount (MatchZoo's ``DiscountedCumulativeGain`` uses ``math.log(2 + idx)``,
not log2 — absolute DCG values differ by ln 2 from the textbook definition;
NDCG ratios are unaffected), ties broken by model-score order.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

DEFAULT_METRICS: Tuple[str, ...] = (
    "map", "mrr", "ap",
    "p@1", "p@3", "p@5", "p@10", "p@20",
    "ndcg@1", "ndcg@3", "ndcg@5", "ndcg@10", "ndcg@20",
    "dcg@1", "dcg@3", "dcg@5", "dcg@10", "dcg@20",
)


def _sorted_labels(y_true: np.ndarray, y_score: np.ndarray) -> np.ndarray:
    order = np.argsort(-np.asarray(y_score), kind="stable")
    return np.asarray(y_true, dtype=np.float64)[order]


def average_precision(y_true, y_score, threshold: float = 0.0) -> float:
    rel = _sorted_labels(y_true, y_score) > threshold
    if not rel.any():
        return 0.0
    precisions = np.cumsum(rel) / (np.arange(rel.size) + 1)
    return float(precisions[rel].mean())


def reciprocal_rank(y_true, y_score, threshold: float = 0.0) -> float:
    rel = _sorted_labels(y_true, y_score) > threshold
    hits = np.nonzero(rel)[0]
    return float(1.0 / (hits[0] + 1)) if hits.size else 0.0


def precision_at_k(y_true, y_score, k: int, threshold: float = 0.0) -> float:
    rel = _sorted_labels(y_true, y_score)[:k] > threshold
    return float(rel.sum() / k)


def dcg_at_k(y_true, y_score, k: int, threshold: float = 0.0) -> float:
    labels = _sorted_labels(y_true, y_score)[:k]
    gains = np.where(labels > threshold, np.power(2.0, labels) - 1.0, 0.0)
    discounts = np.log(np.arange(labels.size) + 2.0)
    return float(np.sum(gains / discounts))


def ndcg_at_k(y_true, y_score, k: int) -> float:
    ideal = dcg_at_k(y_true, y_true, k)
    if ideal <= 0:
        return 0.0
    return dcg_at_k(y_true, y_score, k) / ideal


def eval_metric(name: str, y_true, y_score) -> float:
    name = name.lower()
    if name in ("map", "ap"):
        return average_precision(y_true, y_score)
    if name == "mrr":
        return reciprocal_rank(y_true, y_score)
    if "@" in name:
        base, k_str = name.split("@")
        k = int(k_str)
        if base in ("p", "precision"):
            return precision_at_k(y_true, y_score, k)
        if base == "ndcg":
            return ndcg_at_k(y_true, y_score, k)
        if base == "dcg":
            return dcg_at_k(y_true, y_score, k)
    raise ValueError(f"unknown metric {name!r}")


def evaluate_ranking(
    query_ids: Sequence,
    y_true: Sequence[float],
    y_score: Sequence[float],
    metrics: Iterable[str] = DEFAULT_METRICS,
) -> Dict[str, float]:
    """Group rows by query id, compute each metric per query, average.

    Matches MatchZoo's evaluation protocol (mean over queries; queries with no
    relevant documents contribute 0 to AP/MRR-style metrics).
    """
    qids = np.asarray(query_ids)
    yt = np.asarray(y_true, dtype=np.float64)
    ys = np.asarray(y_score, dtype=np.float64)
    groups: Dict = {}
    for q in np.unique(qids):
        m = qids == q
        groups[q] = (yt[m], ys[m])
    out: Dict[str, float] = {}
    for name in metrics:
        vals = [eval_metric(name, t, s) for t, s in groups.values()]
        out[name] = float(np.mean(vals)) if vals else 0.0
    return out
