"""Per-stage timing for the two-pass top-k: segmax kernel, segment top_k,
gather+rescore. Three compiled programs, one scalar fetch each (axon rules).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

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
    rows, d, qn, k, block_n = 1_250_000, 384, 2048, 10, 16384
    from semanticsearch_tpu.ops.topk import topk_scores_twopass, _segmax_kernel, _round_up, NEG_INF
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (rows, d), 0)
        j = jax.lax.broadcasted_iota(jnp.uint32, (rows, d), 1)
        h = i * jnp.uint32(2654435761) + j * jnp.uint32(40503) + jnp.uint32(977)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0x5BD1E995)
        h = h ^ (h >> 15)
        x = h.astype(jnp.float32) / jnp.float32(2**32) - 0.5
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(dtype)

    corpus = make_corpus()
    _ = float(corpus[0, 0])
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((qn, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    queries = jnp.asarray(qh, dtype=dtype)

    n_pad = _round_up(rows, block_n)
    c_blocks = n_pad // block_n
    total_segs = c_blocks * 128
    block_q = 128

    # --- stage 1: segmax kernel only ---
    @jax.jit
    def passA(q, c):
        q_pad = _round_up(q.shape[0], block_q)
        if q_pad != q.shape[0]:
            q = jnp.pad(q, ((0, q_pad - q.shape[0]), (0, 0)))
        if n_pad != c.shape[0]:
            c = jnp.pad(c, ((0, n_pad - c.shape[0]), (0, 0)))
        mask = jnp.where(jnp.arange(n_pad, dtype=jnp.int32)[None, :] < rows,
                         0.0, NEG_INF).astype(jnp.float32)
        return pl.pallas_call(
            functools.partial(_segmax_kernel, block_q=block_q, block_n=block_n),
            grid=(c_blocks, q_pad // block_q),
            in_specs=[
                pl.BlockSpec((block_q, d), lambda cb, qb: (qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_n, d), lambda cb, qb: (cb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda cb, qb: (0, cb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_q, 128), lambda cb, qb: (qb, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q_pad, total_segs), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, c, mask)

    tA = timeit(passA, queries, corpus)
    print(f"STAGE passA_segmax_kernel: {tA*1e3:.2f} ms", file=sys.stderr)

    # --- stage 2: top_k over the segmax matrix ---
    segmax = passA(queries, corpus)

    @jax.jit
    def seg_topk(sm):
        return jax.lax.top_k(sm, k)

    tB = timeit(seg_topk, segmax)
    print(f"STAGE lax_top_k_{segmax.shape}: {tB*1e3:.2f} ms", file=sys.stderr)

    # --- stage 3: gather + rescore + final top_k ---
    _, seg_ids = seg_topk(segmax)

    @jax.jit
    def rescore(q, c, seg_ids):
        g_size = block_n // 128
        cb_ids = seg_ids // 128
        lane = seg_ids % 128
        g_off = (jnp.arange(g_size, dtype=jnp.int32) * 128)[None, None, :]
        cand = (cb_ids[:, :, None] * block_n + lane[:, :, None] + g_off
                ).reshape(q.shape[0], k * g_size)
        cand = jnp.minimum(cand, rows - 1)
        outs = []
        for s in range(0, q.shape[0], 256):
            rows_g = jnp.take(c, cand[s:s+256], axis=0)
            sc = jnp.einsum("qcd,qd->qc", rows_g, q[s:s+256],
                            preferred_element_type=jnp.float32)
            v, _sel = jax.lax.top_k(sc, k)
            outs.append(v)
        return jnp.concatenate(outs, 0)

    tC = timeit(rescore, queries, corpus, seg_ids)
    print(f"STAGE gather_rescore: {tC*1e3:.2f} ms", file=sys.stderr)
    print(f"TOTAL {1e3*(tA+tB+tC):.2f} ms -> {qn/(tA+tB+tC):.0f} QPS")


if __name__ == "__main__":
    main()
