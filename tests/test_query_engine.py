"""Hybrid serve-time query engine: build, load, dense+BM25 RRF fusion."""
import numpy as np

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.data.tsv import write_tsv
from semanticsearch_tpu.index.query_engine import HybridQueryEngine
from semanticsearch_tpu.models.encoder import SentenceEncoder

TINY = EncoderConfig(vocab_size=500, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_len=32, dtype="float32")


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
    write_tsv(str(p), rows, ["chunk_id", "query_id", "document_id", "chunk_text"])
    return str(p)


def test_hybrid_engine_build_search_load(tmp_path, mesh8):
    enc = SentenceEncoder(TINY)
    engine = HybridQueryEngine.build(
        _chunks(tmp_path), enc, str(tmp_path / "idx"), mesh=mesh8)

    # Lexical query: BM25 leg must pull the exact-word match to the top.
    hits = engine.search(["fishing quota trawlers"], k=3)[0]
    assert hits[0].chunk_id == "c1"
    assert hits[0].lexical_rank == 1

    # Dense-only still works.
    dense_hits = engine.search(["bees and honey"], k=2, hybrid=False)[0]
    assert len(dense_hits) == 2

    # Reload from disk gives the same top hit.
    engine2 = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    hits2 = engine2.search(["fishing quota trawlers"], k=3)[0]
    assert hits2[0].chunk_id == hits[0].chunk_id


def _train_tiny_reranker(ckpt_dir, corpus_texts):
    """Train a tiny KNRM on synthetic pairs and persist the serving artifact
    layout (checkpoint + preprocessor.json, as CVEvaluator.run_model writes)."""
    from semanticsearch_tpu.core.config import TrainConfig
    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.trainer import RerankTrainer
    from semanticsearch_tpu.train.vocab import Preprocessor

    queries = ["fishing quota trawlers", "bees and honey", "solar electricity"]
    rel = {0: 1, 1: 5, 2: 2}  # query -> relevant corpus row
    pp = Preprocessor(fixed_length_left=8, fixed_length_right=24,
                      filter_low_freq=1)
    pp.fit(queries + list(corpus_texts))
    lefts, rights, labels, qids = [], [], [], []
    for qi, q in enumerate(queries):
        for ci, text in enumerate(corpus_texts):
            lefts.append(q)
            rights.append(text)
            labels.append(1.0 if ci == rel[qi] else 0.0)
            qids.append(qi)
    enc = pp.transform_pair(lefts, rights)
    ds = PairDataset(left=enc["left"], right=enc["right"],
                     labels=np.array(labels), query_ids=np.array(qids))
    cfg = TrainConfig(model="knrm", epochs=2, batch_size=4, num_neg=1,
                      embedding_dim=16)
    trainer = RerankTrainer("knrm", vocab_size=pp.vocab_size, cfg=cfg)
    trainer.fit(ds, checkpoint_dir=str(ckpt_dir))
    pp.save(str(ckpt_dir / "preprocessor.json"))


def test_serve_time_rerank(tmp_path, mesh8):
    """Neural rerank stage: reorders (never replaces) the RRF head, attaches
    scores, keeps the tail, and errors cleanly when misconfigured."""
    import pytest

    enc = SentenceEncoder(TINY)
    chunks = _chunks(tmp_path)
    HybridQueryEngine.build(chunks, enc, str(tmp_path / "idx"), mesh=mesh8)

    from semanticsearch_tpu.data.tsv import read_tsv

    corpus_texts = [r["chunk_text"] for r in read_tsv(chunks)]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)

    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    # the loaded texts must be the REAL chunk texts (a header-alias bug once
    # read them all back as "" — rerank silently scored empty strings)
    assert engine.texts == corpus_texts
    queries = ["fishing quota trawlers", "bees and honey"]
    plain = engine.search(queries, k=6)
    reranked = engine.search(queries, k=6, rerank_top=4)
    for qi in range(len(queries)):
        # head: same candidate SET as RRF top-4, ordered by rerank score
        head_ids = {h.chunk_id for h in reranked[qi][:4]}
        assert head_ids == {h.chunk_id for h in plain[qi][:4]}
        head_scores = [h.rerank_score for h in reranked[qi][:4]]
        assert all(s is not None for s in head_scores)
        assert head_scores == sorted(head_scores, reverse=True)
        # tail beyond the rerank head keeps the RRF order, unscored
        assert [h.chunk_id for h in reranked[qi][4:]] == [
            h.chunk_id for h in plain[qi][4:]
        ]
        assert all(h.rerank_score is None for h in reranked[qi][4:])

    # determinism: same call twice -> identical ordering and scores
    again = engine.search(queries, k=6, rerank_top=4)
    assert [[h.chunk_id for h in hits] for hits in again] == [
        [h.chunk_id for h in hits] for hits in reranked
    ]

    # misconfiguration errors are loud, not silent no-ops
    bare = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    with pytest.raises(ValueError, match="no reranker"):
        bare.search(queries, k=3, rerank_top=2)
