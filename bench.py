"""Headline benchmark: exact top-10 cosine retrieval QPS per chip.

BASELINE.md north star: >= 10,000 QPS/chip exact top-10 over a 10M-chunk
corpus (384-dim embeddings) with recall@10 parity vs brute force. This bench
builds a synthetic 10M x 384 bf16 corpus on-device (generation never touches
the host), runs the fused Pallas matmul+top-k kernel in steady state, verifies
recall@10 against the XLA scan reference on a query sample, and prints ONE
JSON line.

Run on the real TPU chip: `python bench.py` (smaller corpora via --rows).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: first-compile on the remote service is slow
# (minutes); cached reruns start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def _build_corpus(n_rows: int, dim: int, dtype):
    """Generate an L2-normalized synthetic corpus directly on device, in slabs
    to bound peak f32 memory."""
    import jax
    import jax.numpy as jnp

    slab = 1_000_000

    @jax.jit
    def make_slab(key):
        x = jax.random.normal(key, (slab, dim), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(dtype)

    keys = jax.random.split(jax.random.PRNGKey(0), (n_rows + slab - 1) // slab)
    slabs = [make_slab(k) for k in keys]
    corpus = jnp.concatenate(slabs, axis=0)[:n_rows]
    return jax.block_until_ready(corpus)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=10_000_000)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--query-batch", type=int, default=256)
    # block_n bounds the VMEM window: block_n * dim * 2B * 2 buffers plus the
    # (block_q, block_n) f32 score tile must stay under ~128MB VMEM.
    parser.add_argument("--block-n", type=int, default=8192)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--recall-sample", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import topk_scores_pallas, topk_scores_ref

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU smoke fallback so the bench always emits a line.
        args.rows = min(args.rows, 100_000)
        args.query_batch = min(args.query_batch, 32)
        args.block_n = 8192
        args.iters = 2

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    corpus = _build_corpus(args.rows, args.dim, dtype)

    rng = np.random.default_rng(1)
    # Distinct query batch per iteration: identical repeated executions can be
    # deduplicated by remote-execution layers and would fake the timing.
    q_batches = []
    for _ in range(args.iters):
        q_host = rng.standard_normal(
            (args.query_batch, args.dim)
        ).astype(np.float32)
        q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
        q_batches.append(jnp.asarray(q_host, dtype=dtype))
    queries = q_batches[0]

    def search(q):
        if on_tpu:
            return topk_scores_pallas(
                q, corpus, k=args.k,
                block_q=min(args.query_batch, 256), block_n=args.block_n,
            )
        return topk_scores_ref(q, corpus, k=args.k)

    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def chained_step(q, carry):
        # one fused dispatch: dependency add + fused top-k kernel
        qd = q + (carry * 0).astype(q.dtype)
        v, i = search(qd)
        return v, i, v[0, 0].astype(jnp.float32)

    # Warmup / compile (scalar fetch forces execution through the tunnel).
    _, _, c0 = chained_step(queries, jnp.zeros((), jnp.float32))
    _ = float(c0)

    # Steady-state timing: chain a data dependency through the iterations so
    # the device must execute them all sequentially, then force ONE final
    # device->host fetch. This excludes per-iteration tunnel round-trips
    # (block_until_ready alone can return early through remote-device
    # tunnels, and per-iteration scalar fetches pay host RTT each step).
    outs = []
    carry = jnp.zeros((), jnp.float32)
    _ = chained_step(q_batches[0], carry)  # compile the chained form
    t0 = time.perf_counter()
    for qb in q_batches:
        v, i, carry = chained_step(qb, carry)
        outs.append((v, i))
    _ = float(carry)  # single sync
    elapsed = time.perf_counter() - t0
    median_iter = elapsed / args.iters
    qps = args.query_batch * args.iters / elapsed

    # Recall@k parity vs a direct XLA matmul + lax.top_k reference on a small
    # sample (materializing a (sample, N) f32 score matrix is fine at this
    # size and compiles in seconds, unlike the streaming scan reference).
    n_sample = min(args.recall_sample, args.query_batch)

    @jax.jit
    def direct_ref(qs):
        # same dtype path as the kernel (bf16 inputs, f32 accumulate) so index
        # agreement checks selection logic, not float rounding
        scores = jnp.einsum("qd,nd->qn", qs, corpus,
                            preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, args.k)[1]

    idx_ref = np.asarray(direct_ref(queries[:n_sample]))
    idx_got = np.asarray(outs[0][1])[:n_sample]
    recall = float(
        np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(idx_got, idx_ref)
        ])
    )

    result = {
        "metric": f"exact_top{args.k}_qps_per_chip_{args.rows}rows_d{args.dim}",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10_000.0, 4),
        "recall_at_k": round(recall, 4),
        "backend": jax.default_backend(),
        "batch": args.query_batch,
        "elapsed_s": round(elapsed, 3),
        "median_iter_s": round(median_iter, 5),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
