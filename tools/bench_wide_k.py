"""Probe: wide-k dense leg (k >= 128) — fused Pallas kernel vs the
column-chunked XLA matmul + staged block selection (ops/topk.py
``topk_scores_chunked``), at the hybrid serve shape (Q=1024, k=160 =
depth 4*k for k=40, 1M-row corpus, d=384 bf16).

Two compiled programs (tunnel budget); timing by blocking scalar fetch
(CLAUDE.md: block_until_ready returns early through the relay). Prints one
JSON line; stages to stderr.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=160)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arm", choices=["fused", "twopass"], default="fused",
                    help="which kernel to compare the chunked path against")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import (
        topk_scores_chunked,
        topk_scores_pallas,
    )
    from synth_corpus import device_unit_rows

    dtype = jnp.bfloat16

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (args.rows, 1), 0)
        return device_unit_rows(i, args.dim, dtype=dtype)

    log("corpus gen...")
    corpus = make_corpus()
    _ = float(corpus[0, 0])
    rng = np.random.default_rng(3)
    q_h = rng.standard_normal((args.q, args.dim)).astype(np.float32)
    q_h /= np.linalg.norm(q_h, axis=1, keepdims=True)
    q = jnp.asarray(q_h, dtype=dtype)

    interp = jax.default_backend() != "tpu"  # CPU smoke runs only
    chunked = jax.jit(functools.partial(topk_scores_chunked, k=args.k))
    if args.arm == "fused":
        other_name = "fused"
        other = jax.jit(functools.partial(
            topk_scores_pallas, k=args.k, interpret=interp))
    else:
        # twopass needs k < 128 and benefits from a precomputed swizzle
        from semanticsearch_tpu.ops.topk import (
            swizzle_corpus,
            topk_scores_twopass,
        )

        assert args.k < 128, "twopass arm requires k < 128"
        other_name = "twopass"
        block_n = 32768
        swz = None

        def other(q, c):
            nonlocal swz
            if swz is None:
                swz = swizzle_corpus(c, block_n)
            return topk_scores_twopass(
                q, c, k=args.k, block_n=block_n, seg_split=8,
                corpus_swizzled=swz, interpret=interp)

    def bench(name, fn):
        ts = []
        for r in range(args.reps + 1):
            t0 = time.perf_counter()
            v, i = fn(q, corpus)
            _ = float(v[0, 0]) + int(i[0, 0])
            dt = time.perf_counter() - t0
            if r:
                ts.append(dt)
            log(f"[{name}] rep{r}: {dt * 1e3:.1f} ms")
        return min(ts)

    t_chunked = bench("chunked", chunked)
    t_other = bench(other_name, other)
    # parity between the two paths on-device (same scores modulo gemm
    # accumulation order; indices must agree except where near-ties swap —
    # require >= 99% overlap per query as a smoke parity gate)
    cv, ci = chunked(q, corpus)
    fv, fi = other(q, corpus)
    ci_h, fi_h = np.asarray(ci), np.asarray(fi)
    overlap = np.mean([
        len(np.intersect1d(ci_h[r], fi_h[r])) / args.k
        for r in range(min(args.q, 64))
    ])
    print(json.dumps({
        "rows": args.rows, "q": args.q, "k": args.k, "dim": args.dim,
        "chunked_ms": round(t_chunked * 1e3, 1),
        f"{other_name}_ms": round(t_other * 1e3, 1),
        "speedup_vs_" + other_name: round(t_other / t_chunked, 2),
        "topk_overlap_sample": round(float(overlap), 4),
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
