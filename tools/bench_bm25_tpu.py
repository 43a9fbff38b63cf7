"""Device-resident BM25 (index/bm25_tpu.py) serve throughput at corpus scale.

Measures the MXU lexical leg against the host C++ kernels on the same
corpus: build/upload cost, steady-state exact top-k QPS, certificate rate,
and a host-parity sample. Run on the real TPU:

    timeout 3600 python tools/bench_bm25_tpu.py --docs 1000000
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import argparse
import json
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--doc-len", type=int, default=12,
                    help="mean doc length; actual lengths vary "
                         "doc-len/2 .. 2*doc-len (realistic chunk mix — "
                         "FIXED lengths produce massive exact score ties "
                         "whose boundary plateaus force host fallbacks)")
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--dense-terms", type=int, default=4096)
    ap.add_argument("--topk-device", type=int, default=64)
    ap.add_argument("--weights", choices=["bf16", "int8"], default="bf16",
                    help="residual-mode query-weight MXU format "
                         "(index/bm25_tpu.py)")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--parity-sample", type=int, default=32)
    ap.add_argument("--host-compare", action="store_true",
                    help="also time the host native kernel on this corpus")
    ap.add_argument("--score-chunk", type=int, default=0,
                    help=">0: override DeviceBM25 score_chunk_cols (the "
                         "column width of one scoring matmul; fewer, wider "
                         "chunks = fewer serialized select/merge points "
                         "at a bigger transient f32 score tile)")
    args = ap.parse_args()

    from semanticsearch_tpu.index.bm25 import BM25Okapi
    from semanticsearch_tpu.index.bm25_tpu import DeviceBM25

    rng = np.random.default_rng(0)
    probs = 1.0 / np.arange(1, args.vocab + 1) ** 1.1
    probs /= probs.sum()
    words = [f"w{i}" for i in range(args.vocab)]
    t0 = time.perf_counter()
    lens = rng.integers(max(2, args.doc_len // 2), args.doc_len * 2,
                        size=args.docs)
    flat = rng.choice(args.vocab, size=int(lens.sum()), p=probs)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    corpus_tokens = [
        [words[t] for t in flat[bounds[i]: bounds[i + 1]]]
        for i in range(args.docs)
    ]
    print(f"[gen] {args.docs} docs (len {lens.min()}-{lens.max()}) in "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    bm = BM25Okapi(corpus_tokens)
    bm._ensure_inverted()
    print(f"[host-index] built in {time.perf_counter()-t0:.0f}s "
          f"(vocab {len(bm.vocab)})", file=sys.stderr)
    del corpus_tokens

    t0 = time.perf_counter()
    dev = DeviceBM25(bm, n_dense_terms=args.dense_terms,
                     topk_device=args.topk_device, query_chunk=args.batch,
                     weights=args.weights,
                     score_chunk_cols=args.score_chunk or None)
    build_s = time.perf_counter() - t0
    dense_gb = args.dense_terms * args.docs / 1e9
    print(f"[device] C ({args.dense_terms} x {args.docs}, {dense_gb:.1f} GB "
          f"int8) built+uploaded in {build_s:.0f}s", file=sys.stderr)

    n_q = args.batch * (args.batches + 1)
    q_ids = rng.choice(args.vocab, size=(n_q, 4), p=probs)
    queries = [[words[t] for t in row] for row in q_ids]

    # warmup batch: compiles the matmul+topk+gather signature
    t0 = time.perf_counter()
    dev.get_topk_batch(queries[: args.batch], args.k)
    print(f"[warmup] first batch (compile) {time.perf_counter()-t0:.0f}s; "
          f"stats {dev.stats}", file=sys.stderr)

    dev.stats = {k: 0 for k in dev.stats}
    t0 = time.perf_counter()
    d_idx, d_sc = dev.get_topk_batch(queries[args.batch:], args.k)
    dt = time.perf_counter() - t0
    qps = (n_q - args.batch) / dt
    print(f"[timed] {args.batches} x {args.batch} queries in {dt:.2f}s "
          f"-> {qps:.0f} QPS; stats {dev.stats}", file=sys.stderr)

    # parity sample vs the host reference
    mism = 0
    for qi in range(args.parity_sample):
        h_idx, h_sc = bm.get_topk(queries[args.batch + qi], args.k)
        if not (np.array_equal(d_idx[qi], h_idx)
                and np.array_equal(d_sc[qi], h_sc)):
            mism += 1
    print(f"[parity] {args.parity_sample - mism}/{args.parity_sample} "
          f"exact vs host get_topk", file=sys.stderr)

    host_qps = None
    if args.host_compare:
        sub = queries[args.batch: args.batch * 2]
        bm.get_topk_batch(sub[:8], args.k)  # warm
        t0 = time.perf_counter()
        bm.get_topk_batch(sub, args.k, n_threads=1)
        host_qps = len(sub) / (time.perf_counter() - t0)
        print(f"[host] native kernel: {host_qps:.1f} QPS (1 thread)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "bm25_device_topk_qps",
        "value": round(qps, 1),
        "unit": "queries/s",
        "docs": args.docs,
        "k": args.k,
        "dense_terms": args.dense_terms,
        "weights": args.weights,
        "score_chunk": dev.score_chunk_cols,
        "dense_gb_int8": round(dense_gb, 2),
        "build_upload_s": round(build_s, 1),
        "fallback_rate": dev.stats["fallbacks"] / max(dev.stats["queries"], 1),
        "parity_exact": f"{args.parity_sample - mism}/{args.parity_sample}",
        "host_native_qps_1thread": host_qps,
    }))


if __name__ == "__main__":
    main()
