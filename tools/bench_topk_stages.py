"""Per-stage timing for the two-pass top-k (swizzled, maskless design):
pass A kernel, pass B full, pass B gather-only. Four compiled programs.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import functools
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=4):
    _force(fn(*args))
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    rows, d, qn, k = 1_250_000, 384, 2048, 10
    block_q, block_n = 256, 8192
    from semanticsearch_tpu.ops.topk import (
        NEG_INF, _round_up, _segtopk_kernel, swizzle_corpus,
    )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16

    from synth_corpus import device_unit_rows

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        return device_unit_rows(i, d, dtype=dtype)

    corpus = make_corpus()
    _ = float(corpus[0, 0])
    corpus_sw = swizzle_corpus(corpus, block_n)
    n_pad0 = _round_up(rows, block_n)
    corpus_padded = jnp.pad(corpus, ((0, n_pad0 - rows), (0, 0)))
    _ = float(corpus_padded[0, 0])
    _ = float(corpus_sw[0, 0])
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((qn, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    queries = jnp.asarray(qh, dtype=dtype)

    n_pad = _round_up(rows, block_n)
    q_pad = _round_up(qn, block_q)
    L = block_n // 128
    c_blocks = n_pad // block_n
    n_valid_segs = -(-rows // L)
    k_sel = k + 1

    @jax.jit
    def passA(q, c_sw):
        return pl.pallas_call(
            functools.partial(
                _segtopk_kernel, k_sel=k_sel, block_q=block_q,
                block_n=block_n, n_valid_segs=n_valid_segs,
            ),
            grid=(c_blocks, q_pad // block_q),
            in_specs=[
                pl.BlockSpec((block_q, d), lambda cb, qb: (qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_n, d), lambda cb, qb: (cb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_q, 128), lambda cb, qb: (qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 128), lambda cb, qb: (qb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((q_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((q_pad, 128), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((q_pad, 128), jnp.float32),
                pltpu.VMEM((q_pad, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, c_sw)

    tA = timeit(passA, queries, corpus_sw)
    print(f"STAGE passA_kernel(bq{block_q},bn{block_n}): {tA*1e3:.2f} ms",
          file=sys.stderr, flush=True)

    _, seg_full = passA(queries, corpus_sw)
    seg_ids = jnp.asarray(np.asarray(seg_full)[:, :k_sel])

    corpus_segs_shape = (c_blocks * 128, L, d)

    @jax.jit
    def passB_gather(c, ids):
        segs = c.reshape(corpus_segs_shape)
        outs = []
        for s in range(0, q_pad, 256):
            outs.append(jnp.take(segs, jnp.maximum(ids[s:s+256], 0), axis=0))
        return jnp.concatenate([o.reshape(256, -1) for o in outs], 0)

    tG = timeit(passB_gather, corpus_padded, seg_ids)
    print(f"STAGE passB_gather_only: {tG*1e3:.2f} ms", file=sys.stderr,
          flush=True)

    @jax.jit
    def passB(q, c, ids):
        segs = c.reshape(corpus_segs_shape)
        safe = jnp.maximum(ids, 0)
        cand = (safe[:, :, None] * L
                + jnp.arange(L, dtype=jnp.int32)[None, None, :]
                ).reshape(q_pad, k_sel * L)
        valid = (ids[:, :, None] >= 0).reshape(q_pad, k_sel, 1) & (
            (safe[:, :, None] * L
             + jnp.arange(L, dtype=jnp.int32)[None, None, :]) < rows
        )
        valid = valid.reshape(q_pad, k_sel * L)
        out_v, out_i = [], []
        for s in range(0, q_pad, 256):
            blocks = jnp.take(segs, safe[s:s+256], axis=0)
            sc = jnp.einsum("qkld,qd->qkl", blocks, q[s:s+256],
                            preferred_element_type=jnp.float32
                            ).reshape(256, k_sel * L)
            sc = jnp.where(valid[s:s+256], sc, NEG_INF)
            v, sel = jax.lax.top_k(sc, k)
            out_v.append(v)
            out_i.append(jnp.take_along_axis(cand[s:s+256], sel, axis=1))
        return jnp.concatenate(out_v, 0), jnp.concatenate(out_i, 0)

    tB = timeit(passB, queries, corpus_padded, seg_ids)
    print(f"STAGE passB_full: {tB*1e3:.2f} ms", file=sys.stderr, flush=True)
    print(f"TOTAL A+B {1e3*(tA+tB):.2f} ms -> {qn/(tA+tB):.0f} QPS")


if __name__ == "__main__":
    main()
