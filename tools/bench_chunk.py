"""Chunking-pipeline throughput: docs/s and chunks/s through the real encoder.

The reference logs chunks/s and avg chunks/doc per config
(`simple_chunk_controller.py:1347-1352`); this measures the same counters for
the TPU pipeline on a synthetic Robust04-shaped corpus.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300)
    ap.add_argument("--sents-per-doc", type=int, default=30)
    ap.add_argument("--method", default="splitter",
                    choices=["splitter", "grouping", "char"])
    args = ap.parse_args()

    from semanticsearch_tpu.core.config import get_named_config
    from semanticsearch_tpu.chunking.pipeline import ChunkPipeline
    from semanticsearch_tpu.data.tsv import write_tsv

    rng = np.random.default_rng(0)
    vocab = [f"tok{i}" for i in range(2000)]
    rows = []
    for d in range(args.docs):
        sents = []
        topic = rng.choice(vocab, size=5)
        for s in range(args.sents_per_doc):
            words = list(rng.choice(topic if s % 3 else vocab, size=9))
            sents.append(" ".join(words).capitalize() + ".")
        rows.append({
            "query_id": f"q{d % 10}", "query_text": "q",
            "document_id": f"d{d}", "document": " ".join(sents),
            "label": str(d % 2),
        })

    name = {"splitter": "semantic_splitter", "grouping": "semantic_grouping",
            "char": "text_splitter_char"}[args.method]
    cfg = get_named_config(name)

    with tempfile.TemporaryDirectory() as tmp:
        corpus = os.path.join(tmp, "corpus.tsv")
        write_tsv(corpus, rows,
                  ["query_id", "query_text", "document_id", "document", "label"])
        pipe = ChunkPipeline(cfg)
        # Warmup run loads every jit signature (through remote links this is
        # a one-time multi-minute cost per process); the timed run measures
        # the steady-state throughput a long-running chunking service sees.
        warm = pipe.run(corpus, tmp, write_eval=False)
        summary = pipe.run(corpus, tmp, write_eval=False)

    import jax

    print(json.dumps({
        "method": args.method,
        "docs": summary["docs_chunked"],
        "chunks": summary["chunks_out"],
        "chunks_per_sec": summary["chunks_per_sec"],
        "docs_per_sec": round(summary["docs_chunked"] / summary["elapsed_s"], 2),
        "avg_chunks_per_doc": summary["avg_chunks_per_doc"],
        "elapsed_s": summary["elapsed_s"],
        "first_run_s": warm["elapsed_s"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
