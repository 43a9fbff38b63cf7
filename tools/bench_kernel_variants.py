"""Kernel microbenchmarks to localize pass-A cost: dot-only vs dot+segmax
vs chunked dot+max, at block_q 256/512. Five compiled programs.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


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


def build(kind, block_q, block_n, q_pad, c_blocks, d):
    def dot_only(q_ref, c_ref, o_ref):
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = scores[:, :LANE]

    def dot_segmax(q_ref, c_ref, o_ref):
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        L = block_n // LANE
        o_ref[:] = jnp.max(scores.reshape(block_q, L, LANE), axis=1)

    def dot_chunked(q_ref, c_ref, o_ref):
        L = block_n // LANE
        seg = jnp.full((block_q, LANE), NEG_INF, jnp.float32)
        CH = 8  # lane-groups per sub-dot
        for j in range(0, L, CH):
            s = jax.lax.dot_general(
                q_ref[:], c_ref[pl.ds(j * LANE, CH * LANE), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            seg = jnp.maximum(
                seg, jnp.max(s.reshape(block_q, CH, LANE), axis=1)
            )
        o_ref[:] = seg

    kern = {"dot": dot_only, "segmax": dot_segmax, "chunked": dot_chunked}[kind]
    return pl.pallas_call(
        kern,
        grid=(c_blocks, q_pad // block_q),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda cb, qb: (cb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, LANE), lambda cb, qb: (qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def main():
    rows, d, qn = 1_250_000, 384, 2048
    block_n = 8192

    from synth_corpus import device_unit_rows

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        return device_unit_rows(i, d, dtype=jnp.bfloat16)

    corpus = make_corpus()
    _ = float(corpus[0, 0])
    n_pad = ((rows + block_n - 1) // block_n) * block_n
    corpus_p = jnp.pad(corpus, ((0, n_pad - rows), (0, 0)))
    _ = float(corpus_p[0, 0])
    c_blocks = n_pad // block_n
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((qn, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    queries = jnp.asarray(qh, jnp.bfloat16)

    for kind, bq in [("dot", 256), ("segmax", 256), ("chunked", 256),
                     ("segmax", 512), ("chunked", 512)]:
        f = jax.jit(build(kind, bq, block_n, qn, c_blocks, d))
        t = timeit(f, queries, corpus_p)
        print(f"STAGE {kind}_bq{bq}: {t*1e3:.2f} ms", file=sys.stderr,
              flush=True)
    print("done")


if __name__ == "__main__":
    main()
