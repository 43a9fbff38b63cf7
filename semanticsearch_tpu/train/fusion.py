"""Validation-tuned WEIGHTED reciprocal-rank fusion.

The reference fuses cosine + BM25 with UNWEIGHTED RRF
(``Tool/rank_chunks_optimized.py:225-239``): each leg contributes
``1 / (k + rank)`` with equal weight. That is the right prior when the legs
are comparably strong, but at scale the measured legs are not: the trained
dense leg reaches MAP 0.50 while the BM25 leg sits at 0.15 (BASELINE.md
scale table), and equal weighting drags the fused list BELOW the stronger
leg (hybrid 0.32). Weighted RRF keeps the complementary-recall benefit of
fusion while letting a small labeled validation split set the mix:

    fused(d) = 2*alpha / (k + r_dense(d)) + 2*(1 - alpha) / (k + r_lex(d))

``alpha = 0.5`` reproduces the reference's unweighted fusion EXACTLY
(the factor 2 keeps the absolute score scale identical at the default, so
downstream thresholds keep their meaning). ``tune_fusion_alpha`` grid
searches alpha against ranking metrics on held-out labels — the same
validate-on-a-split pattern the reference uses for reranker epoch selection
(``MatchZoo_Tool/train_controller.py:556-560``), applied to the fusion
stage it never tunes. Beyond-parity capability.

Serving integration: ``RankingConfig.fusion_alpha`` (default ``None`` =
reference-exact unweighted fusion) weights the two legs inside
``HybridQueryEngine``'s RRF merge; ``HybridQueryEngine.tune_fusion`` runs
the grid search against live engine legs on a labeled validation set.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..index.rrf import ranks_from_scores, rrf_weights

__all__ = ["DEFAULT_GRID", "rrf_weights", "weighted_rrf", "tune_fusion_alpha"]

DEFAULT_GRID: Tuple[float, ...] = tuple(np.round(np.linspace(0.0, 1.0, 21), 3))


def weighted_rrf(
    dense_scores: np.ndarray,
    lex_scores: np.ndarray,
    alpha: Optional[float] = None,
    k: int = 60,
) -> np.ndarray:
    """Weighted RRF over full per-query score rows.

    ``dense_scores`` / ``lex_scores``: (Q, D) score matrices over the SAME
    document axis. Returns the (Q, D) fused score matrix. ``alpha=None`` or
    0.5 reproduces unweighted reference RRF exactly.
    """
    dense_scores = np.asarray(dense_scores)
    lex_scores = np.asarray(lex_scores)
    if dense_scores.shape != lex_scores.shape:
        raise ValueError(
            f"score shapes differ: {dense_scores.shape} vs {lex_scores.shape}")
    w_d, w_l = rrf_weights(alpha)
    out = np.empty(dense_scores.shape, np.float64)
    for qi in range(dense_scores.shape[0]):
        r_d = ranks_from_scores(dense_scores[qi])
        r_l = ranks_from_scores(lex_scores[qi])
        out[qi] = w_d / (k + r_d) + w_l / (k + r_l)
    return out


def tune_fusion_alpha(
    dense_scores: np.ndarray,
    lex_scores: np.ndarray,
    labels: np.ndarray,
    k: int = 60,
    grid: Sequence[float] = DEFAULT_GRID,
    metric: str = "map",
) -> Tuple[float, float, Dict[float, float]]:
    """Grid-search the fusion alpha on a labeled validation split.

    ``labels``: (Q, D) binary relevance. Returns ``(best_alpha, best_value,
    {alpha: value})``. Ties break toward 0.5 (the reference's unweighted
    fusion) so tuning never drifts from parity without a measured win.
    """
    from .metrics import eval_metric

    labels = np.asarray(labels)
    table: Dict[float, float] = {}
    for alpha in grid:
        fused = weighted_rrf(dense_scores, lex_scores, alpha=alpha, k=k)
        vals = [eval_metric(metric, labels[qi], fused[qi])
                for qi in range(labels.shape[0])]
        table[float(alpha)] = float(np.mean(vals))
    best_alpha = max(table, key=lambda a: (table[a], -abs(a - 0.5)))
    return best_alpha, table[best_alpha], table
