"""Weighted-RRF fusion + validation-tuned alpha (train/fusion.py).

The reference fuses with UNWEIGHTED RRF only (rank_chunks_optimized.py:
225-239); the weighted variant and its tuner are beyond-parity. The
load-bearing contracts: alpha=None/0.5 is BIT-IDENTICAL to the reference
fusion, the tuner finds the stronger leg on synthetic extremes, and the
engine's fusion_alpha knob reorders serve results accordingly.
"""
import dataclasses

import numpy as np
import pytest

from semanticsearch_tpu.core.config import EncoderConfig, RankingConfig
from semanticsearch_tpu.data.tsv import write_tsv
from semanticsearch_tpu.index.query_engine import HybridQueryEngine
from semanticsearch_tpu.index.rrf import rrf_fuse, rrf_weights
from semanticsearch_tpu.models.encoder import SentenceEncoder
from semanticsearch_tpu.train.fusion import tune_fusion_alpha, weighted_rrf

TINY = EncoderConfig(vocab_size=500, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_len=32, dtype="float32")


def test_rrf_weights_default_is_parity():
    assert rrf_weights(None) == (1.0, 1.0)
    assert rrf_weights(0.5) == (1.0, 1.0)
    assert rrf_weights(1.0) == (2.0, 0.0)
    assert rrf_weights(0.0) == (0.0, 2.0)
    with pytest.raises(ValueError):
        rrf_weights(1.5)


def test_weighted_rrf_half_matches_unweighted_exactly():
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(5, 40))
    lex = rng.normal(size=(5, 40))
    fused = weighted_rrf(dense, lex, alpha=0.5)
    fused_none = weighted_rrf(dense, lex, alpha=None)
    for qi in range(5):
        ref = rrf_fuse([dense[qi], lex[qi]])
        np.testing.assert_array_equal(fused[qi], ref)
        np.testing.assert_array_equal(fused_none[qi], ref)


def test_weighted_rrf_extremes_follow_single_leg_order():
    rng = np.random.default_rng(1)
    dense = rng.normal(size=(3, 30))
    lex = rng.normal(size=(3, 30))
    d_order = np.argsort(-dense, axis=1, kind="stable")
    l_order = np.argsort(-lex, axis=1, kind="stable")
    np.testing.assert_array_equal(
        np.argsort(-weighted_rrf(dense, lex, alpha=1.0), axis=1,
                   kind="stable"), d_order)
    np.testing.assert_array_equal(
        np.argsort(-weighted_rrf(dense, lex, alpha=0.0), axis=1,
                   kind="stable"), l_order)


def _synthetic(seed, strong="dense", nq=16, nd=60):
    """One informative leg (scores correlate with labels), one pure noise."""
    rng = np.random.default_rng(seed)
    labels = (rng.random((nq, nd)) < 0.1).astype(np.float32)
    labels[:, 0] = 1.0  # every query has at least one relevant doc
    informative = labels * 2.0 + rng.normal(scale=0.3, size=(nq, nd))
    noise = rng.normal(size=(nq, nd))
    return (informative, noise, labels) if strong == "dense" else (
        noise, informative, labels)


def test_tuner_prefers_the_informative_leg():
    dense, lex, labels = _synthetic(2, strong="dense")
    alpha, best, table = tune_fusion_alpha(dense, lex, labels)
    assert alpha > 0.5
    assert best >= table[0.5]
    dense, lex, labels = _synthetic(3, strong="lex")
    alpha, _, _ = tune_fusion_alpha(dense, lex, labels)
    assert alpha < 0.5


def test_tuner_ties_break_toward_parity():
    # both legs identical -> every alpha scores the same -> pick 0.5
    rng = np.random.default_rng(4)
    labels = (rng.random((4, 20)) < 0.2).astype(np.float32)
    labels[:, 0] = 1.0
    scores = labels * 3.0 + rng.normal(scale=0.01, size=(4, 20))
    alpha, _, table = tune_fusion_alpha(scores, scores.copy(), labels)
    assert alpha == 0.5
    assert len(set(np.round(list(table.values()), 12))) == 1


def _chunks(tmp_path):
    rows = [
        {"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
         "chunk_text": text}
        for i, text in enumerate([
            "volcanic eruption spewed lava and ash across the island",
            "the fishing quota for trawlers was reduced this season",
            "solar panels convert sunlight into electricity efficiently",
            "the ancient aqueduct carried water to the roman city",
            "high speed trains run between the two capital stations",
            "bees pollinate flowers and produce honey in the hive",
        ])
    ]
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    return str(p)


def test_engine_fusion_alpha_reweights_serve_results(tmp_path, mesh8):
    enc = SentenceEncoder(TINY)
    idx = str(tmp_path / "idx")
    HybridQueryEngine.build(_chunks(tmp_path), enc, idx, mesh=mesh8)
    query = ["fishing quota trawlers"]

    parity = HybridQueryEngine.load(str(idx), enc, mesh=mesh8)
    base_hits = parity.search(query, k=6)[0]

    # alpha=0.5 must reproduce the default fusion scores exactly
    half = HybridQueryEngine.load(
        str(idx), enc, mesh=mesh8,
        rank_cfg=RankingConfig(fusion_alpha=0.5))
    half_hits = half.search(query, k=6)[0]
    assert [h.chunk_id for h in half_hits] == [h.chunk_id for h in base_hits]
    np.testing.assert_array_equal([h.score for h in half_hits],
                                  [h.score for h in base_hits])

    # alpha=1.0: fused order == dense ranks; alpha=0.0: == lexical ranks
    dense_only = HybridQueryEngine.load(
        str(idx), enc, mesh=mesh8, rank_cfg=RankingConfig(fusion_alpha=1.0))
    hits = dense_only.search(query, k=6)[0]
    dr = [h.dense_rank for h in hits if h.dense_rank > 0]
    assert dr == sorted(dr)
    lex_only = HybridQueryEngine.load(
        str(idx), enc, mesh=mesh8, rank_cfg=RankingConfig(fusion_alpha=0.0))
    hits = lex_only.search(query, k=6)[0]
    lr = [h.lexical_rank for h in hits if h.lexical_rank > 0]
    assert lr == sorted(lr)
    # the exact-word match rides the lexical leg to the top at alpha=0
    assert hits[0].chunk_id == "c1"


def test_engine_tune_fusion_returns_valid_alpha(tmp_path, mesh8):
    enc = SentenceEncoder(TINY)
    idx = str(tmp_path / "idx")
    HybridQueryEngine.build(_chunks(tmp_path), enc, idx, mesh=mesh8)
    engine = HybridQueryEngine.load(str(idx), enc, mesh=mesh8)
    queries = ["fishing quota trawlers", "bees honey hive"]
    relevant = [["c1"], ["c5"]]
    alpha, best, table = engine.tune_fusion(queries, relevant,
                                            grid=(0.0, 0.25, 0.5, 0.75, 1.0))
    assert 0.0 <= alpha <= 1.0
    assert best == max(table.values())
    assert set(table) == {0.0, 0.25, 0.5, 0.75, 1.0}
    # applying the tuned alpha works end to end
    tuned = HybridQueryEngine.load(
        str(idx), enc, mesh=mesh8,
        rank_cfg=dataclasses.replace(engine.cfg, fusion_alpha=alpha))
    assert tuned.search(queries, k=3)[0]


def test_persisted_fusion_alpha_applies_on_load(tmp_path, mesh8):
    import json
    import os

    from semanticsearch_tpu.index.query_engine import FUSION_FILE

    enc = SentenceEncoder(TINY)
    idx = str(tmp_path / "idx")
    HybridQueryEngine.build(_chunks(tmp_path), enc, idx, mesh=mesh8)
    with open(os.path.join(idx, FUSION_FILE), "w") as f:
        json.dump({"fusion_alpha": 0.8}, f)
    engine = HybridQueryEngine.load(str(idx), enc, mesh=mesh8)
    assert engine.cfg.fusion_alpha == 0.8
    # an explicit caller value overrides the persisted one
    engine = HybridQueryEngine.load(
        str(idx), enc, mesh=mesh8, rank_cfg=RankingConfig(fusion_alpha=0.3))
    assert engine.cfg.fusion_alpha == 0.3


def test_engine_tune_fusion_requires_bm25(tmp_path, mesh8):
    import os

    from semanticsearch_tpu.index.query_engine import BM25_FILE

    enc = SentenceEncoder(TINY)
    idx = str(tmp_path / "idx")
    HybridQueryEngine.build(_chunks(tmp_path), enc, idx, mesh=mesh8)
    os.remove(os.path.join(idx, BM25_FILE))  # dense-only index
    engine = HybridQueryEngine.load(str(idx), enc, mesh=mesh8)
    with pytest.raises(ValueError, match="hybrid index"):
        engine.tune_fusion(["bees"], [["c5"]])
