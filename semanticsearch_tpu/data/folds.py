"""Cross-validation fold construction over (query_id, chunk_text, label) rows.

Replaces the reference's MatchZoo DataPack builder
(``MatchZoo_Tool/create_matchzoo_datapacks.py:299-738``) with plain TSV folds:
same semantics — seed-42 shuffle, K sequential index folds, fold k's test =
fold k, train = the other K-1 folds — but no .dam pickles; each fold is a TSV
the trainer's Preprocessor + PairDataset consume directly. A ``fold_info.txt``
summary is written like the reference's (``:717-738``).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from .tsv import read_tsv, write_tsv
from .validate import parse_label

FOLD_COLUMNS = ["query_id", "chunk_text", "label"]


@dataclass
class FoldPaths:
    train: str
    test: str


def create_cv_folds(
    input_path: str,
    output_dir: str,
    num_folds: int = 5,
    seed: int = 42,
    text_column: str = "chunk_text",
) -> List[FoldPaths]:
    """Split a labeled TSV into K CV folds on disk."""
    rows = []
    for row in read_tsv(input_path):
        lab = parse_label(row.get("label", ""))
        text = str(row.get(text_column, "")).strip()
        qid = str(row.get("query_id", "")).strip()
        if lab is None or not text or not qid:
            continue
        rows.append({"query_id": qid, "chunk_text": text, "label": str(lab)})
    if not rows:
        raise ValueError(f"no valid rows in {input_path}")

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]

    os.makedirs(output_dir, exist_ok=True)
    bounds = np.linspace(0, len(rows), num_folds + 1).astype(int)
    fold_slices = [rows[bounds[k]: bounds[k + 1]] for k in range(num_folds)]

    out: List[FoldPaths] = []
    info_lines = [f"rows={len(rows)} folds={num_folds} seed={seed}"]
    for k in range(num_folds):
        test_rows = fold_slices[k]
        train_rows = [r for j in range(num_folds) if j != k for r in fold_slices[j]]
        train_path = os.path.join(output_dir, f"fold_{k + 1}_train.tsv")
        test_path = os.path.join(output_dir, f"fold_{k + 1}_test.tsv")
        write_tsv(train_path, train_rows, FOLD_COLUMNS)
        write_tsv(test_path, test_rows, FOLD_COLUMNS)
        info_lines.append(
            f"fold_{k + 1}: train={len(train_rows)} test={len(test_rows)}"
        )
        out.append(FoldPaths(train=train_path, test=test_path))
    with open(os.path.join(output_dir, "fold_info.txt"), "w") as f:
        f.write("\n".join(info_lines) + "\n")
    return out


def load_fold_rows(path: str) -> Dict[str, List]:
    """Load a fold TSV into parallel lists (query_ids, texts, labels)."""
    qids: List[str] = []
    texts: List[str] = []
    labels: List[float] = []
    queries: List[str] = []
    for row in read_tsv(path):
        lab = parse_label(row.get("label", ""))
        if lab is None:
            continue
        qids.append(row["query_id"])
        queries.append(row.get("query_text", row["query_id"]))
        texts.append(row["chunk_text"])
        labels.append(float(lab))
    return {
        "query_ids": qids,
        "query_texts": queries,
        "chunk_texts": texts,
        "labels": labels,
    }
