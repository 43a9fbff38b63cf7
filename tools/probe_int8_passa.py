"""Decision probe for VERDICT-r3 item 2: certified int8(+residual) on dense
pass A of ``topk_scores_twopass``.

Two measurements, combined into one projection:

1. HOST recall simulation (no TPU): simulate pass-A segment selection with
   int8-quantized scores on the bench corpus distribution (unit rows from
   the integer-hash generator, d=384, 32-row fine segments — the headline
   seg_split=8/block_n=32768 geometry) and sweep k_sel: how many segments
   must pass A over-select for the true top-10 rows' segments to ALL
   survive int8 noise? This is the pass-B cost multiplier.
   Also computes the SOUND certification bound (Cauchy-Schwarz on the
   quantization residual) for the plain and residual variants — the width
   that decides whether a deterministic certificate can ever be tight
   without a second full matmul.

2. TPU timing probe (``--tpu``): pass-A-shaped matmul + segment-max at the
   headline config (256x32768 tile times 1.25M rows, d=384) in bf16 vs
   int8, XLA einsum — the achievable int8:bf16 ratio at THESE shapes
   (the bm25 probe measured 1.44x at its own shapes;
   BASELINE.md device-BM25 row).

Projection: new_pass_A = matmul/ratio (+ matmul/ratio again if residual),
new_pass_B = pass_B * k_sel_needed/(k+1); net QPS vs the 288 ms headline.

Usage:
  python tools/probe_int8_passa.py            # host recall sim only
  python tools/probe_int8_passa.py --tpu      # + device timing probe
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def unit_rows(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def quantize_rows(x, bits=8):
    """Symmetric per-tensor int8: scale = max|x|/127 (the scheme whose
    dequant-free segment max works — per-row corpus scales would need a
    full-tile VPU dequant, the exact cost the kernel exists to avoid)."""
    s = float(np.abs(x).max()) / 127.0
    q = np.clip(np.rint(x / s), -127, 127).astype(np.int8)
    return q, s


def host_recall_sim(n=200_000, d=384, n_q=512, k=10, seg=32, seed=0):
    corpus = unit_rows(n, d, seed)
    queries = unit_rows(n_q, d, seed + 1)
    c8, sc = quantize_rows(corpus)
    q8, sq = quantize_rows(queries)

    n_segs = n // seg
    true_scores = queries @ corpus.T                       # f32 oracle
    approx = (q8.astype(np.int32) @ c8.astype(np.int32).T).astype(np.float64)
    approx *= sc * sq

    err = approx - true_scores
    p99 = float(np.percentile(np.abs(err), 99))
    # SOUND per-row bounds (what a deterministic certificate must use):
    #   |q . res_c| <= ||q||2 * ||res_c||2   (Cauchy-Schwarz)
    res_c = corpus - c8.astype(np.float32) * sc
    res_q = queries - q8.astype(np.float32) * sq
    bound_plain = float(
        np.linalg.norm(res_c, axis=1).max()            # * ||q||2 == 1
        + np.linalg.norm(res_q, axis=1).max() * (1 + np.abs(c8 * sc).max())
    )
    # residual variant: a second int8 matrix of res_c at scale ~sc/254
    r8, sr = quantize_rows(res_c)
    res2 = res_c - r8.astype(np.float32) * sr
    bound_residual = float(
        np.linalg.norm(res2, axis=1).max()
        + np.linalg.norm(res_q, axis=1).max() * (1 + np.abs(c8 * sc).max())
    )

    seg_true = true_scores.reshape(n_q, n_segs, seg).max(axis=2)
    seg_approx = approx.reshape(n_q, n_segs, seg).max(axis=2)
    true_k_segs = np.argsort(-seg_true, axis=1)  # segments by true max
    # segments holding the TRUE top-k rows
    top_rows = np.argsort(-true_scores, axis=1)[:, :k]
    need_segs = top_rows // seg

    out = {"err_p99": p99, "bound_plain": bound_plain,
           "bound_residual": bound_residual, "n_segs": n_segs}
    ks = [k + 1, k + 2, k + 4, k + 8, k + 16, k + 32, k + 64]
    sel_order = np.argsort(-seg_approx, axis=1)
    for k_sel in ks:
        sel = sel_order[:, :k_sel]
        covered = 0
        for qi in range(n_q):
            covered += int(set(need_segs[qi]) <= set(sel[qi]))
        miss = n_q - covered
        out[f"cover_q@k_sel={k_sel}"] = covered / n_q
        if miss == 0 and "k_sel_all_covered" not in out:
            out["k_sel_all_covered"] = k_sel
    del true_k_segs
    return out


def tpu_probe(d=384, rows=1_250_000 // 131072 * 131072, reps=3):
    """bf16 vs int8 pass-A-shaped matmul+segmax on the real chip.

    Column-chunked (131072 corpus rows per einsum) so the score tile stays
    2 GB instead of the 20 GB full matrix; segment max reduces each chunk
    before the next (the same stream-and-reduce shape as the Pallas pass A,
    minus its in-kernel merge). TWO compiled programs total (CLAUDE.md
    budget: keep bench scripts to <= 3)."""
    import jax
    import jax.numpy as jnp

    n_q = 4096  # enough tiles to amortize
    chunk = 131072
    corpus = unit_rows(rows, d, 0)
    queries = unit_rows(n_q, d, 1)
    c8, sc = quantize_rows(corpus)
    q8, sq = quantize_rows(queries)
    seg = 32

    def passa(q, c, acc_dtype):
        outs = []
        for s in range(0, rows, chunk):
            t = jnp.einsum("qd,nd->qn", q, c[s: s + chunk],
                           preferred_element_type=acc_dtype)
            outs.append(jnp.max(
                t.reshape(n_q, chunk // seg, seg), axis=2))
        return jnp.concatenate(outs, axis=1)

    passa_bf16 = jax.jit(lambda q, c: passa(q, c, jnp.float32))
    passa_int8 = jax.jit(lambda q, c: passa(q, c, jnp.int32))

    timings = {}
    for name, fn, qa, ca in (
        ("bf16", passa_bf16, jnp.asarray(queries, jnp.bfloat16),
         jnp.asarray(corpus, jnp.bfloat16)),
        ("int8", passa_int8, jnp.asarray(q8), jnp.asarray(c8)),
    ):
        out = fn(qa, ca)
        _ = float(jnp.asarray(out[0, 0], jnp.float32))  # force through tunnel
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(qa, ca)
            _ = float(jnp.asarray(out[0, 0], jnp.float32))
            best = min(best, time.perf_counter() - t0)
        flops = 2.0 * n_q * rows * d
        timings[name] = {"ms": round(best * 1e3, 2),
                         "tops": round(flops / best / 1e12, 1)}
        print(f"[tpu] {name}: {timings[name]}", file=sys.stderr)
    timings["ratio"] = round(
        timings["bf16"]["ms"] / timings["int8"]["ms"], 3)
    return timings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=512)
    args = ap.parse_args()

    t0 = time.perf_counter()
    sim = host_recall_sim(n=args.rows, n_q=args.queries)
    print(f"[sim] {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    result = {"metric": "int8_passa_probe", "host_sim": sim}

    if args.tpu:
        result["tpu"] = tpu_probe()

    # projection against the BASELINE.md headline anatomy (batch 32768,
    # block_n 32768 / seg_split 8): matmul 164 ms, segmax 84, merge 34,
    # pass B 33, total 288 ms
    matmul, passb, total, k = 164.0, 33.0, 288.0, 10
    ratio = result.get("tpu", {}).get("ratio", 1.44)
    k_need = sim.get("k_sel_all_covered")
    for variant, n_pass in (("int8", 1), ("int8_residual", 2)):
        if variant == "int8" and k_need is None:
            result[f"proj_{variant}"] = "no k_sel achieved full coverage"
            continue
        k_sel = (k + 1) if n_pass == 2 else k_need
        new_total = (total - matmul + n_pass * matmul / ratio
                     - passb + passb * k_sel / (k + 1))
        result[f"proj_{variant}"] = {
            "k_sel": k_sel, "ms": round(new_total, 1),
            "qps": round(32768 / new_total * 1000),
            "vs_headline_288ms": round(288.0 / new_total, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
