"""Probe: where does the device-BM25 scoring program spend its time, and
would int8 MXU passes beat the current bf16 passes?

Three compiled programs (the tunnel budget), each timed with a blocking
scalar fetch (CLAUDE.md: block_until_ready returns early through the relay):

  1. head-pass matmul ONLY, bf16:  W (Q, B) bf16 @ C (B, D) int8->bf16 -> f32
     (the non-residual scoring floor)
  2. the same matmul with W8 (Q, B) int8 @ C int8 -> int32
     (the proposed int8-MXU pass: if v5e runs this at ~2x the bf16 rate and
     without the int8->bf16 convert traffic, a 2-pass int8 weight split +
     1-pass int8 residual halves the current 3-bf16-pass residual design)
  3. the FULL current select_all pipeline (residual-mode triple pass +
     chunked two-stage selection + merge loop) at serve shapes
     (index/bm25_tpu.py), isolating selection+merge overhead = (3) - 3x(1).

Usage: python tools/probe_bm25_matmul.py [--docs 1000000] [--reps 3]
Prints one JSON line; stages to stderr.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--nb", type=int, default=4096)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--kp", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax.numpy as jnp

    D = args.docs - args.docs % 256  # _SEL_BLOCK alignment
    B, Q = args.nb, args.q
    rng = np.random.default_rng(0)
    log(f"[gen] C ({B}, {D}) int8 on host")
    C_h = rng.integers(-127, 128, size=(B, D), dtype=np.int8)
    t0 = time.perf_counter()
    # Upload ONLY the residual stand-in (2B, D); the head programs slice its
    # first half inside jit. One resident copy keeps the HBM budget at
    # 8.2 GB + one 4.1 GB transient score output (a second C copy + two live
    # outputs OOMed the 16 GB chip).
    CC = jax.device_put(np.concatenate([C_h, C_h], axis=0))
    del C_h
    _ = int(np.asarray(CC[0, 0]))
    log(f"[upload] {2 * B * D / 1e9:.1f} GB in {time.perf_counter() - t0:.1f}s")

    W = jnp.asarray(rng.standard_normal((Q, B)).astype(np.float32),
                    jnp.bfloat16)
    W8 = jnp.asarray(rng.integers(-127, 128, size=(Q, B), dtype=np.int8))
    W2 = jnp.asarray(rng.standard_normal((Q, 2 * B)).astype(np.float32),
                     jnp.bfloat16)

    @jax.jit
    def mm_bf16(W, CC):
        return jnp.einsum("qb,bd->qd", W, CC[:B].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def mm_int8(W8, CC):
        return jnp.einsum("qb,bd->qd", W8, CC[:B],
                          preferred_element_type=jnp.int32)

    from semanticsearch_tpu.index.bm25_tpu import _SCORE_CHUNK, _block_topk

    chunk = _SCORE_CHUNK

    @functools.partial(jax.jit, static_argnames=("kp",))
    def full_residual_select(W, W2, CC, kp):
        # mirrors bm25_tpu.select_all in residual mode: chunked triple-pass
        # scoring + two-stage selection + running merge
        nb = B
        lc = CC.shape[1]
        nfull = lc // chunk

        def score_cols(sl):
            Cb = sl.astype(jnp.bfloat16)
            return jnp.einsum("qb,bd->qd", W, Cb[:nb],
                              preferred_element_type=jnp.float32) + \
                jnp.einsum("qb,bd->qd", W2, Cb,
                           preferred_element_type=jnp.float32)

        def body(i, carry):
            run_v, run_i = carry
            sl = jax.lax.dynamic_slice_in_dim(CC, i * chunk, chunk, axis=1)
            cv, ci = _block_topk(score_cols(sl), kp)
            av = jnp.concatenate([run_v, cv], axis=1)
            ai = jnp.concatenate(
                [run_i, (ci + i * chunk).astype(jnp.int32)], axis=1)
            mv, sel = jax.lax.top_k(av, kp)
            return mv, jnp.take_along_axis(ai, sel, axis=1)

        init = (jnp.full((Q, kp), -jnp.inf, jnp.float32),
                jnp.zeros((Q, kp), jnp.int32))
        return jax.lax.fori_loop(0, nfull, body, init)

    def bench(name, fn, fetch):
        ts = []
        for r in range(args.reps + 1):
            t0 = time.perf_counter()
            out = fn()
            _ = fetch(out)
            dt = time.perf_counter() - t0
            # Free the (Q, D) score output before the next rep allocates its
            # own — two live 4.1 GB outputs plus CC exceed HBM.
            for leaf in jax.tree_util.tree_leaves(out):
                leaf.delete()
            if r:
                ts.append(dt)
            log(f"[{name}] rep{r}: {dt * 1e3:.1f} ms")
        return min(ts)

    res = {}
    res["bf16_head_ms"] = round(bench(
        "bf16 head", lambda: mm_bf16(W, CC),
        lambda o: float(np.asarray(o[0, 0]))) * 1e3, 1)
    res["int8_head_ms"] = round(bench(
        "int8 head", lambda: mm_int8(W8, CC),
        lambda o: int(np.asarray(o[0, 0]))) * 1e3, 1)
    res["full_residual_select_ms"] = round(bench(
        "full residual+select", lambda: full_residual_select(
            W, W2, CC, args.kp),
        lambda o: float(np.asarray(o[0][0, 0]))) * 1e3, 1)
    res.update({
        "docs": D, "nb": B, "q": Q, "kp": args.kp,
        "bf16_tfs": round(2 * Q * B * D / res["bf16_head_ms"] * 1e-9, 1),
        "int8_tops": round(2 * Q * B * D / res["int8_head_ms"] * 1e-9, 1),
        # selection+merge+extra-pass overhead beyond 3 head-equivalents
        "overhead_vs_3x_head_ms": round(
            res["full_residual_select_ms"] - 3 * res["bf16_head_ms"], 1),
        "platform": jax.default_backend(),
    })
    print(json.dumps(res))


if __name__ == "__main__":
    main()
