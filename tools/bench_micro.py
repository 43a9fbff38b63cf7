"""Micro-benchmarks for the fused top-k kernel: sweep k / blocks / modes.

Usage: python tools/bench_micro.py [--rows 1250000]
Per-call scalar fetch timing (tunnel RTT included; use large block_q).
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_250_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import topk_scores_pallas

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (args.rows, args.dim), 0)
        j = jax.lax.broadcasted_iota(jnp.uint32, (args.rows, args.dim), 1)
        h = i * jnp.uint32(2654435761) + j * jnp.uint32(40503) + jnp.uint32(977)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0x5BD1E995)
        h = h ^ (h >> 15)
        x = h.astype(jnp.float32) / jnp.float32(2**32) - 0.5
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(dtype)

    corpus = make_corpus()
    _ = float(corpus[0, 0])
    rng = np.random.default_rng(1)

    def run(tag, **kw):
        qs = [
            jnp.asarray(rng.standard_normal((2048, args.dim)), dtype)
            for _ in range(args.iters)
        ]
        try:
            v, i = topk_scores_pallas(qs[0], corpus, **kw)
            _ = float(v[0, 0])
            times = []
            for q in qs:
                t0 = time.perf_counter()
                v, i = topk_scores_pallas(q, corpus, **kw)
                _ = float(v[0, 0])
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{tag:40s} best={best*1e3:8.2f}ms qps={2048/best:10.1f}",
                  flush=True)
        except Exception as exc:
            print(f"{tag:40s} FAILED: {str(exc)[:100]}", flush=True)

    run("seg   k=10 bq256 bn32768",
        k=10, block_q=256, block_n=32768, segmented=True)
    run("seg   k=10 bq512 bn16384",
        k=10, block_q=512, block_n=16384, segmented=True)
    run("plain k=1  bq256 bn16384",
        k=1, block_q=256, block_n=16384, segmented=False)
    run("seg   k=10 bq128 bn16384",
        k=10, block_q=128, block_n=16384, segmented=True)
    run("seg   k=10 bq512 bn32768",
        k=10, block_q=512, block_n=32768, segmented=True)


if __name__ == "__main__":
    main()
