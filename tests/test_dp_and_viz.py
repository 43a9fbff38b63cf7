"""DP segmentation refinement + visual-debug exports."""
import os

import numpy as np

from semanticsearch_tpu.core.config import ChunkingConfig, get_named_config
from semanticsearch_tpu.chunking.dp_segment import auto_penalty, dp_optimal_segmentation
from semanticsearch_tpu.chunking.splitter import split_by_embeddings
from semanticsearch_tpu.chunking.visualize import (
    export_document_debug,
    groups_to_labels,
    load_ideal_bounds,
)


def _topic_embeddings(rng, sizes, d=64, noise=0.05):
    out = []
    for s in sizes:
        center = rng.standard_normal(d)
        center /= np.linalg.norm(center)
        out.append(center[None, :] + noise * rng.standard_normal((s, d)))
    emb = np.concatenate(out, axis=0)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def test_dp_picks_low_coherence_cut():
    # adj sims high within blocks, low at index 4 (boundary between 4 and 5)
    adj = np.array([0.9, 0.9, 0.9, 0.9, 0.1, 0.9, 0.9, 0.9, 0.9])
    cuts = dp_optimal_segmentation(adj, candidates=[2, 5, 7], penalty=0.05)
    assert 5 in cuts
    # huge penalty -> no cuts
    assert dp_optimal_segmentation(adj, candidates=[2, 5, 7], penalty=10.0) == []


def test_auto_penalty_nonnegative():
    assert auto_penalty([0.5, 0.6, 0.4]) >= 0.0
    assert auto_penalty([]) == 0.0


def test_splitter_dp_config_is_wired(rng):
    emb = _topic_embeddings(rng, [12, 12])
    cfg = get_named_config("semantic_splitter_dp").chunking
    assert cfg.use_dp_refine
    groups = split_by_embeddings(emb, cfg)
    flat = [i for g in groups for i in g]
    assert flat == list(range(24))


def test_dp_penalty_scale_granularity_knob(rng):
    """r5 frontier sweep lever: dp_penalty_scale < 1 scales down the
    auto-derived penalty, admitting MORE cuts (finer chunks); >> 1 admits
    fewer. Monotone in the number of groups on a multi-topic doc."""
    emb = _topic_embeddings(rng, [8, 8, 8, 8], noise=0.25)
    base = get_named_config("semantic_splitter_dp").chunking
    counts = {}
    for scale in (0.1, 1.0, 50.0):
        import dataclasses

        cfg = dataclasses.replace(base, dp_penalty_scale=scale)
        counts[scale] = len(split_by_embeddings(emb, cfg))
    assert counts[0.1] >= counts[1.0] >= counts[50.0]
    assert counts[0.1] > counts[50.0]


def test_visual_exports(tmp_path, rng):
    emb = _topic_embeddings(rng, [8, 8])
    groups = [list(range(8)), list(range(8, 16))]
    paths = export_document_debug("docV", emb, groups, str(tmp_path))
    for key, p in paths.items():
        assert p is not None and os.path.exists(p), key
    labels = groups_to_labels(groups, 16)
    assert set(labels.tolist()) == {0, 1}


def test_ideal_bounds_loader(tmp_path):
    (tmp_path / "docX.bounds").write_text("3 7\n12")
    assert load_ideal_bounds(str(tmp_path), "docX") == [3, 7, 12]
    assert load_ideal_bounds(str(tmp_path), "missing") is None
