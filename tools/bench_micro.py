"""Micro-benchmarks for the fused top-k kernel: sweep k / block sizes.

Usage: python tools/bench_micro.py [--rows 2000000]
Times use dependency chaining + one final fetch (see bench.py).
"""
from __future__ import annotations

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import topk_scores_pallas

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (args.rows, args.dim), jnp.float32)
    corpus = (corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)).astype(dtype)
    _ = float(corpus[0, 0])

    rng = np.random.default_rng(1)

    def run(block_q, block_n, k):
        qs = [
            jnp.asarray(rng.standard_normal((block_q, args.dim)), dtype)
            for _ in range(args.iters)
        ]
        # compile
        v, i = topk_scores_pallas(qs[0], corpus, k=k, block_q=block_q,
                                  block_n=block_n)
        _ = float(v[0, 0])
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for q in qs:
            qd = q + (carry * 0).astype(q.dtype)
            v, i = topk_scores_pallas(qd, corpus, k=k, block_q=block_q,
                                      block_n=block_n)
            carry = v[0, 0]
        _ = float(carry)
        dt = (time.perf_counter() - t0) / args.iters
        qps = block_q / dt
        print(f"block_q={block_q:4d} block_n={block_n:6d} k={k:3d} "
              f"iter={dt*1e3:8.2f}ms qps={qps:10.1f}")

    for block_q, block_n, k in [
        (256, 8192, 10),
        (256, 8192, 1),
        (256, 16384, 10),
        (128, 8192, 10),
        (512, 8192, 10),
        (256, 4096, 10),
    ]:
        try:
            run(block_q, block_n, k)
        except Exception as exc:
            print(f"block_q={block_q} block_n={block_n} k={k} FAILED: "
                  f"{str(exc)[:120]}")


if __name__ == "__main__":
    main()
