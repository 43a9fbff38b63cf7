"""BM25 lexical-leg serve throughput: inverted-index get_topk vs full scan.

Validates the serve-time story for the hybrid engine's lexical leg at
corpus scale (the reference scores rank_bm25 over every document per query,
Tool/rank_chunks_optimized.py:219-222).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--doc-len", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    from semanticsearch_tpu.index.bm25 import BM25Okapi

    rng = np.random.default_rng(0)
    # Zipf-ish term distribution like real text
    probs = 1.0 / np.arange(1, args.vocab + 1) ** 1.1
    probs /= probs.sum()
    words = [f"w{i}" for i in range(args.vocab)]
    t0 = time.perf_counter()
    term_ids = rng.choice(args.vocab, size=(args.docs, args.doc_len), p=probs)
    corpus_tokens = [[words[t] for t in row] for row in term_ids]
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    bm = BM25Okapi(corpus_tokens)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    bm._ensure_inverted()
    invert_s = time.perf_counter() - t0

    q_ids = rng.choice(args.vocab, size=(args.queries, 4), p=probs)
    queries = [[words[t] for t in row] for row in q_ids]

    # warm + timed: inverted top-k
    _ = bm.get_topk(queries[0], args.k)
    t0 = time.perf_counter()
    for q in queries:
        bm.get_topk(q, args.k)
    topk_qps = args.queries / (time.perf_counter() - t0)

    # native batch top-k: unpruned posting traversal (the serve default,
    # one multiply-add per entry on precomputed quotients) vs MaxScore
    _ = bm.get_topk_batch(queries[:2], args.k)
    t0 = time.perf_counter()
    bm.get_topk_batch(queries, args.k, n_threads=1)
    native_qps = args.queries / (time.perf_counter() - t0)

    _ = bm.get_topk_batch(queries[:2], args.k, method="maxscore")
    t0 = time.perf_counter()
    bm.get_topk_batch(queries, args.k, n_threads=1, method="maxscore")
    maxscore_qps = args.queries / (time.perf_counter() - t0)

    # full scan for comparison (single queries, few reps) — skipped at
    # very large corpora: get_scores is a per-doc Python loop whose single
    # rep would take minutes-to-hours at 10M docs
    scan_qps = None
    if args.docs <= 2_000_000:
        reps = min(10, args.queries)
        t0 = time.perf_counter()
        for q in queries[:reps]:
            bm.get_scores(q)
        scan_qps = reps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"bm25_serve_topk_{args.docs}docs",
        "topk_qps": round(topk_qps, 1),
        "native_unpruned_qps_1thread": round(native_qps, 1),
        "native_maxscore_qps_1thread": round(maxscore_qps, 1),
        "full_scan_qps": round(scan_qps, 2) if scan_qps else None,
        "speedup": (round(topk_qps / max(scan_qps, 1e-9), 1)
                    if scan_qps else None),
        "build_s": round(build_s, 1),
        "invert_s": round(invert_s, 1),
        "gen_s": round(gen_s, 1),
        "k": args.k,
    }))


if __name__ == "__main__":
    main()
