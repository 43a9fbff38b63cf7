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


def _make_rows(rng, vocab, n_docs, sents_per_doc, tag=""):
    rows = []
    for d in range(n_docs):
        sents = []
        topic = rng.choice(vocab, size=5)
        for s in range(sents_per_doc):
            words = list(rng.choice(topic if s % 3 else vocab, size=9))
            sents.append(" ".join(words).capitalize() + ".")
        rows.append({
            "query_id": f"q{d % 10}", "query_text": "q",
            "document_id": f"d{tag}{d}", "document": " ".join(sents),
            "label": str(d % 2),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300)
    ap.add_argument("--sents-per-doc", type=int, default=30)
    ap.add_argument("--method", default="splitter",
                    choices=["splitter", "grouping", "char"])
    ap.add_argument("--long", action="store_true",
                    help="long-tail mode (VERDICT-r4 weak 4): per-bucket "
                         "docs/s at sentence counts matched to the "
                         "reference length distribution incl. the p99 "
                         "~3,900-sentence tail "
                         "(document_length_summary.json: median 10 / p90 "
                         "45 / max 3,939) — the regime where the grouping "
                         "engine's O(n^3) device eigh and the 4096-sentence "
                         "jit bucket are real")
    args = ap.parse_args()

    from semanticsearch_tpu.core.config import get_named_config
    from semanticsearch_tpu.chunking.pipeline import ChunkPipeline
    from semanticsearch_tpu.data.tsv import write_tsv

    rng = np.random.default_rng(0)
    vocab = [f"tok{i}" for i in range(2000)]

    name = {"splitter": "semantic_splitter", "grouping": "semantic_grouping",
            "char": "text_splitter_char"}[args.method]
    cfg = get_named_config(name)
    if args.long:
        # the 512-sentence eval cap is a CPU-eval concession; the tail
        # bench runs the production 4096 cap (untruncated corpus max)
        cfg = cfg.override(chunking={"max_sentences": 4096})

    import jax

    if args.long:
        # (sentences/doc, docs): median, p90, and the deep tail. Doc counts
        # shrink with size so each bucket's wall stays minutes-bounded; the
        # 3939 bucket is the corpus max (pads to the 4096 jit bucket).
        buckets = [(10, 120), (45, 60), (200, 24), (512, 8),
                   (1024, 4), (2048, 2), (3939, 1)]
        pipe = ChunkPipeline(cfg)
        out_buckets = []
        with tempfile.TemporaryDirectory() as tmp:
            for (spd, nd) in buckets:
                rows = _make_rows(rng, vocab, nd, spd, tag=f"L{spd}_")
                corpus = os.path.join(tmp, f"corpus_{spd}.tsv")
                write_tsv(corpus, rows, ["query_id", "query_text",
                                         "document_id", "document", "label"])
                warm = pipe.run(corpus, tmp, write_eval=False)
                summary = pipe.run(corpus, tmp, write_eval=False)
                row = {
                    "sents_per_doc": spd, "docs": nd,
                    "docs_per_sec": round(nd / summary["elapsed_s"], 3),
                    "chunks": summary["chunks_out"],
                    "avg_chunks_per_doc": summary["avg_chunks_per_doc"],
                    "elapsed_s": summary["elapsed_s"],
                    "first_run_s": warm["elapsed_s"],
                }
                out_buckets.append(row)
                print(f"[bucket {spd}] {row}", file=sys.stderr)
        print(json.dumps({
            "metric": "chunk_longtail",
            "method": args.method,
            "buckets": out_buckets,
            "backend": jax.default_backend(),
        }))
        return

    rows = _make_rows(rng, vocab, args.docs, args.sents_per_doc)
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
