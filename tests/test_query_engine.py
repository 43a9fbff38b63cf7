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
