"""Pair-mode training-batch construction (num_dup / num_neg / resample).

Reproduces MatchZoo's pairwise Dataset semantics as the reference uses them
(``MatchZoo_Tool/train_controller.py:583-634``): for every query, each
positive example is duplicated ``num_dup`` times; each duplicate is grouped
with ``num_neg`` sampled negatives (the pairwise-ranking group is positive
first, negatives after); groups are reshuffled and negatives resampled every
epoch when ``resample=True``. Queries lacking a positive or a negative are
excluded — the pairability constraint the reference checks before training
(``Train_Conv_KNRM[choose].py:55-137``, ``validate_and_clean_tsv.py:117-163``).
Batches have static shape (batch_size * (1 + num_neg), L) for jit stability.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence

import numpy as np


@dataclass
class PairDataset:
    """Holds transformed arrays + group structure for pairwise sampling."""

    left: np.ndarray        # (N, L_left) int32
    right: np.ndarray       # (N, L_right) int32
    labels: np.ndarray      # (N,) float
    query_ids: np.ndarray   # (N,) any

    def __post_init__(self) -> None:
        self._by_query: Dict = {}
        for i, q in enumerate(self.query_ids):
            self._by_query.setdefault(q, []).append(i)
        self.pairable_queries = [
            q for q, idxs in self._by_query.items()
            if any(self.labels[i] > 0 for i in idxs)
            and any(self.labels[i] <= 0 for i in idxs)
        ]

    def iter_pair_batches(
        self,
        batch_size: int,
        num_dup: int = 1,
        num_neg: int = 1,
        seed: int = 0,
        epoch: int = 0,
        resample: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches of pairwise groups.

        Each batch: left/right of shape (batch_size*(1+num_neg), L); within a
        group the positive row comes first. The trailing partial batch is
        FLUSHED, not dropped: it is padded to batch_size with wrap-around
        groups from the same epoch permutation (real pairs, so the gradient
        stays valid and static shapes hold). Dropping it silently ran ZERO
        steps whenever the dataset had fewer groups than batch_size.
        """
        rng = np.random.default_rng(seed + (epoch if resample else 0))
        groups: List[List[int]] = []
        for q in self.pairable_queries:
            idxs = self._by_query[q]
            pos = [i for i in idxs if self.labels[i] > 0]
            neg = [i for i in idxs if self.labels[i] <= 0]
            for p in pos:
                for _ in range(num_dup):
                    ns = rng.choice(neg, size=num_neg, replace=len(neg) < num_neg)
                    groups.append([p] + list(ns))
        if not groups:
            return
        order = rng.permutation(len(groups))
        group_w = 1 + num_neg
        for s in range(0, len(order), batch_size):
            chunk = order[s: s + batch_size]
            if len(chunk) < batch_size:
                # pad with wrap-around groups (repeats if fewer groups than
                # the pad needs — np.resize cycles)
                chunk = np.concatenate(
                    [chunk, np.resize(order, batch_size - len(chunk))]
                )
            sel = [groups[g] for g in chunk]
            rows = np.asarray(sel).reshape(-1)  # (B*group_w,)
            yield {
                "left": self.left[rows],
                "right": self.right[rows],
                "labels": self.labels[rows].astype(np.float32),
                "group_size": group_w,
            }

    def iter_point_batches(
        self, batch_size: int, pad_to_full: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Point-mode batches for evaluation (reference test-loader mode,
        ``train_controller.py:605-613``). Pads the final batch (with a mask)
        so every step has static shape."""
        n = self.left.shape[0]
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            idx = np.arange(s, e)
            valid = np.ones(e - s, dtype=bool)
            if pad_to_full and e - s < batch_size:
                pad = batch_size - (e - s)
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            yield {
                "left": self.left[idx],
                "right": self.right[idx],
                "labels": self.labels[idx].astype(np.float32),
                "row_ids": idx,
                "valid": valid,
            }
