"""Per-stage timing for the two-pass top-k at any config: pass-A kernel
alone, full two-pass, and the pass-B candidate gather alone (XLA take).
Three-four compiled programs; pass-B cost = full - passA.

Usage (headline config):
    python tools/bench_topk_stages.py --block-n 32768 --seg-split 8 \
        --qn 16384 --block-q 256
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_250_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--qn", type=int, default=16384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--block-n", type=int, default=32768)
    ap.add_argument("--seg-split", type=int, default=8)
    ap.add_argument("--q-chunk", type=int, default=256)
    ap.add_argument("--skip-gather", action="store_true",
                    help="skip the gather-only program (saves one compile)")
    args = ap.parse_args()
    rows, d, qn, k = args.rows, args.dim, args.qn, args.k
    block_q, block_n, seg_split = args.block_q, args.block_n, args.seg_split

    from semanticsearch_tpu.ops.topk import (
        _round_up, _segtopk_kernel, swizzle_corpus, topk_scores_twopass,
    )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    from synth_corpus import device_unit_rows

    @jax.jit
    def make_corpus():
        i = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        return device_unit_rows(i, d, dtype=dtype)

    corpus = make_corpus()
    _ = float(corpus[0, 0])
    corpus_sw = swizzle_corpus(corpus, block_n)
    _ = float(corpus_sw[0, 0])
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((qn, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    queries = jnp.asarray(qh, dtype=dtype)

    n_pad = _round_up(rows, block_n)
    q_pad = _round_up(qn, block_q)
    L = block_n // 128
    L2 = L // seg_split
    c_blocks = n_pad // block_n
    n_valid_segs = -(-rows // L2)
    k_sel = k + 1

    @jax.jit
    def passA(q, c_sw):
        return pl.pallas_call(
            functools.partial(
                _segtopk_kernel, k_sel=k_sel, block_q=block_q,
                block_n=block_n, n_valid_segs=n_valid_segs,
                seg_split=seg_split,
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
    mm_tf = 2.0 * q_pad * n_pad * d / tA / 1e12
    print(f"STAGE passA(bq{block_q},bn{block_n},ss{seg_split}): "
          f"{tA*1e3:.2f} ms = {mm_tf:.1f} TF/s", file=sys.stderr, flush=True)

    @jax.jit
    def full(q, c, c_sw):
        return topk_scores_twopass(
            q, c, k=k, block_q=block_q, block_n=block_n,
            q_chunk=args.q_chunk, corpus_swizzled=c_sw, seg_split=seg_split,
        )

    tF = timeit(full, queries, corpus, corpus_sw)
    print(f"STAGE full_twopass: {tF*1e3:.2f} ms (passB ~ {(tF-tA)*1e3:.2f} "
          f"ms)", file=sys.stderr, flush=True)

    tG = None
    if not args.skip_gather:
        _, seg_full = passA(queries, corpus_sw)
        seg_ids = jnp.asarray(np.asarray(seg_full)[:, :k_sel])
        corpus_padded = jnp.pad(corpus, ((0, n_pad - rows), (0, 0)))
        _ = float(corpus_padded[0, 0])

        @jax.jit
        def passB_gather(c, ids):
            segs = c.reshape(n_pad // L2, L2, d)
            outs = []
            for s in range(0, q_pad, args.q_chunk):
                outs.append(
                    jnp.take(segs, jnp.maximum(ids[s:s + args.q_chunk], 0),
                             axis=0).sum(axis=(1, 2, 3))
                )
            return jnp.concatenate(outs, 0)

        tG = timeit(passB_gather, corpus_padded, seg_ids)
        print(f"STAGE passB_gather_only: {tG*1e3:.2f} ms", file=sys.stderr,
              flush=True)

    print(json.dumps({
        "metric": "twopass_stage_ms",
        "config": {"rows": rows, "qn": qn, "block_q": block_q,
                   "block_n": block_n, "seg_split": seg_split},
        "passA_ms": round(tA * 1e3, 2),
        "passA_tf_s": round(mm_tf, 1),
        "full_ms": round(tF * 1e3, 2),
        "passB_ms": round((tF - tA) * 1e3, 2),
        "gather_only_ms": round(tG * 1e3, 2) if tG is not None else None,
        "qps_full": round(qn / tF, 1),
    }))


if __name__ == "__main__":
    main()
