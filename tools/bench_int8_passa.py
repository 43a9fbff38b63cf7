"""Same-process A/B: bf16 vs int8 pass A of topk_scores_twopass on the TPU.

Headline geometry (block_n 32768 / seg_split 8, 1.25M-row corpus, d=384),
batch --qn (default 16384; the BASELINE anatomy row's config). Reports
best-iteration time, QPS, and the int8 mode's recall@k against the exact
bf16 run over a host-checked query sample. THREE compiled programs
(bf16 run, int8 run, swizzle+quantize prep).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_250_000)
    ap.add_argument("--qn", type=int, default=16384)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--block-n", type=int, default=32768)
    ap.add_argument("--seg-split", type=int, default=8)
    ap.add_argument("--k-sel-extra", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--recall-sample", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import (
        quantize_int8_global, swizzle_corpus, topk_scores_twopass,
    )
    sys.path.insert(0, "tools")
    from synth_corpus import device_unit_rows

    dev = jax.devices()[0]
    print(f"[dev] {dev}", file=sys.stderr)

    @jax.jit
    def prep():
        i = jax.lax.broadcasted_iota(jnp.uint32, (args.rows, 1), 0)
        corpus = device_unit_rows(i, args.d, dtype=jnp.bfloat16)
        swz = swizzle_corpus(corpus, args.block_n)
        c8, sc = quantize_int8_global(swz)
        return corpus, swz, c8, sc

    corpus, swz, c8, sc = prep()
    _ = float(jnp.asarray(c8[0, 0], jnp.float32))
    rng = np.random.default_rng(1)
    q_host = rng.standard_normal((args.qn, args.d)).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    queries = jnp.asarray(q_host, jnp.bfloat16)
    print("[prep] swizzled + quantized", file=sys.stderr)

    runs = {}
    results = {}
    for name, kw in (
        ("bf16", dict()),
        ("int8", dict(pass_a_int8=True, corpus_swizzled_q8=c8,
                      k_sel_extra=args.k_sel_extra)),
    ):
        fn = lambda q, _kw=kw: topk_scores_twopass(
            q, corpus, k=args.k, block_q=256, block_n=args.block_n,
            q_chunk=256, corpus_swizzled=swz, seg_split=args.seg_split,
            **_kw)
        v, i = fn(queries)
        _ = float(v[0, 0])  # force completion through the tunnel
        best = float("inf")
        for _r in range(args.reps):
            t0 = time.perf_counter()
            v, i = fn(queries)
            _ = float(v[0, 0])
            best = min(best, time.perf_counter() - t0)
        runs[name] = (np.asarray(v[: args.recall_sample]),
                      np.asarray(i[: args.recall_sample]))
        results[name] = {"ms": round(best * 1e3, 1),
                         "qps": round(args.qn / best)}
        print(f"[{name}] {results[name]}", file=sys.stderr)

    bv, bi = runs["bf16"]
    iv, ii = runs["int8"]
    hits = sum(len(set(bi[q]) & set(ii[q])) for q in range(bi.shape[0]))
    recall = hits / bi.size
    results["int8"]["recall_vs_bf16"] = round(recall, 6)
    results["speedup"] = round(results["bf16"]["ms"]
                               / results["int8"]["ms"], 3)
    print(json.dumps({"metric": "int8_passa_ab", "qn": args.qn,
                      "rows": args.rows, "k_sel_extra": args.k_sel_extra,
                      **results}))


if __name__ == "__main__":
    main()
