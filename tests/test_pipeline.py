"""Golden-path test: tiny corpus TSV -> chunk -> rank -> folds end to end."""
import json
import os

import numpy as np

from semanticsearch_tpu.core.config import Config, EncoderConfig, get_named_config
from semanticsearch_tpu.chunking.pipeline import ChunkPipeline
from semanticsearch_tpu.data.folds import create_cv_folds
from semanticsearch_tpu.data.tsv import read_tsv, write_tsv
from semanticsearch_tpu.index.ranker import QueryGroup, rank_and_filter_groups
from semanticsearch_tpu.models.encoder import SentenceEncoder

TINY_ENC = EncoderConfig(
    vocab_size=500, hidden_dim=32, num_layers=1, num_heads=2,
    mlp_dim=64, max_len=64, dtype="float32",
)


def _tiny_corpus(tmp_path, n_queries=2, docs_per_q=2):
    rows = []
    for q in range(n_queries):
        for d in range(docs_per_q):
            doc = " ".join(
                f"Sentence {s} of document {d} for query {q} discusses topic "
                f"{'alpha' if s < 5 else 'omega'} in detail."
                for s in range(10)
            )
            rows.append({
                "query_id": f"q{q}", "query_text": f"topic alpha query {q}",
                "document_id": f"q{q}_d{d}", "document": doc,
                "label": str(d % 2),
            })
    p = tmp_path / "corpus.tsv"
    write_tsv(str(p), rows,
              ["query_id", "query_text", "document_id", "document", "label"])
    return str(p)


def test_pipeline_splitter_end_to_end(tmp_path):
    corpus = _tiny_corpus(tmp_path)
    cfg = get_named_config("semantic_splitter").override(
        encoder=TINY_ENC.__dict__,
        chunking={"collect_metadata": True},
    )
    pipe = ChunkPipeline(cfg, encoder=SentenceEncoder(TINY_ENC))
    summary = pipe.run(corpus, str(tmp_path / "out"), write_chunk_map=True)
    assert summary["docs_chunked"] == 4
    assert summary["chunks_out"] >= 4
    rows = list(read_tsv(summary["output_path"]))
    assert all(r["chunk_text"] for r in rows)
    assert os.path.exists(tmp_path / "out" / "semantic_splitter_chunk_map.tsv")
    blob = json.load(open(tmp_path / "out" / "semantic_splitter_summary.json"))
    assert blob["chunks_out"] == summary["chunks_out"]


def test_pipeline_char_end_to_end(tmp_path):
    corpus = _tiny_corpus(tmp_path)
    cfg = get_named_config("text_splitter_char")
    summary = ChunkPipeline(cfg).run(corpus, str(tmp_path / "out"))
    assert summary["chunks_out"] >= summary["docs_chunked"]


def test_chunk_then_rank_then_folds(tmp_path):
    corpus = _tiny_corpus(tmp_path)
    cfg = get_named_config("semantic_splitter").override(encoder=TINY_ENC.__dict__)
    enc = SentenceEncoder(TINY_ENC)
    summary = ChunkPipeline(cfg, encoder=enc).run(corpus, str(tmp_path / "out"))

    # group chunks per query and rank with the hybrid scorer
    groups = {}
    for r in read_tsv(summary["output_path"]):
        g = groups.setdefault(r["query_id"], QueryGroup(
            query_id=r["query_id"], query_text=f"topic alpha query"))
        g.chunk_ids.append(r["chunk_id"] if "chunk_id" in r else r["document_id"])
        g.chunk_texts.append(r["chunk_text"])
    ranked = rank_and_filter_groups(list(groups.values()), enc.encode)
    assert ranked, "ranking produced no labeled chunks"

    labeled = tmp_path / "labeled.tsv"
    write_tsv(
        str(labeled),
        ({"query_id": r.query_id, "chunk_text": r.chunk_text,
          "label": str(r.label)} for r in ranked),
        ["query_id", "chunk_text", "label"],
    )
    folds = create_cv_folds(str(labeled), str(tmp_path / "cv"), num_folds=2)
    assert len(folds) == 2
