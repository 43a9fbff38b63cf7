"""Fused cosine-scoring + top-k selection over a corpus embedding matrix.

This is the TPU-native replacement for the reference's exact per-query scoring
(``Tool/rank_chunks_optimized.py:216-235``: sklearn ``cosine_similarity`` over
the whole chunk matrix followed by ``np.argsort``). Instead of materializing a
full ``(num_queries, corpus)`` score matrix in HBM and sorting it, a Pallas
kernel streams corpus blocks HBM->VMEM, computes the score tile on the MXU, and
maintains a running per-query top-k in VMEM scratch — the only HBM output is
``(num_queries, k)`` values + indices. For a 10M-chunk corpus this reduces the
score-memory footprint from O(Q*N) to O(Q*K).

Layout contract: embeddings are row-major ``(N, D)`` with D a multiple of 128
(pad if needed); queries are ``(Q, D)``. Both should be L2-normalized for
cosine semantics (dot == cosine), matching the reference's normalize-then-dot
(``Method/Semantic_Splitter_Optimized.py:140-152``).
"""
from __future__ import annotations

import functools
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANE = 128
# Query-chunking threshold for topk_scores_twopass: above this the call
# splits into per-chunk kernel launches (the (q_pad, 128) running-top-k
# VMEM scratch OOMs at 65536 queries; 32768 is also the measured QPS sweet
# spot). Module-level so tests can exercise the chunked path at CPU scale.
_MAX_TWOPASS_Q = 32768


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _select_topk_rows(vals, idxs, k: int, out_width: int):
    """K-pass iterative selection: returns (B, out_width) top values + indices.

    vals: (B, W) scores; idxs: (B, W) int32 global indices. Runs on the VPU —
    exactly k passes of max/min reductions (no sort); the output is padded to
    the lane-aligned ``out_width`` with NEG_INF / 0. Ties break to the lowest
    index.
    """
    b = vals.shape[0]
    out_vals = []
    out_idxs = []
    big = jnp.int32(2**31 - 1)
    for _ in range(k):
        m = jnp.max(vals, axis=1, keepdims=True)
        is_max = vals >= m
        cand = jnp.where(is_max, idxs, big)
        sel = jnp.min(cand, axis=1, keepdims=True)
        out_vals.append(m)
        out_idxs.append(sel)
        vals = jnp.where(idxs == sel, NEG_INF, vals)
    pad = out_width - k
    if pad:
        out_vals.append(jnp.full((b, pad), NEG_INF, vals.dtype))
        out_idxs.append(jnp.zeros((b, pad), jnp.int32))
    return (
        jnp.concatenate(out_vals, axis=1),
        jnp.concatenate(out_idxs, axis=1),
    )


def _select_topk_segmented(scores, base, acc_v, acc_i, k: int, k_pad: int):
    """Exact two-stage top-k merge of a score tile into the running top-k.

    Stage 1 reduces the (B, T) tile to per-128-column segment maxima (one
    pass over the tile) and selects the top-k segments. The top-k elements of
    the tile provably live in those segments: if an element's segment were
    outside the k best-by-max segments, k segments each contain an element
    exceeding it. Stage 2 gathers the k winning segments with a one-hot
    batched matmul (MXU, no dynamic gather) and runs the k-pass selection on
    the narrow (B, k_pad + k*128) strip instead of the full tile — the VPU
    work drops from O(k*T) to O(T + k^2*128) per row.
    """
    b, t = scores.shape
    nseg = t // _LANE
    s3 = scores.reshape(b, nseg, _LANE)
    segmax = jnp.max(s3, axis=2)  # (B, nseg)

    # top-k segments by max, ties to the lowest segment id (consistent with
    # global lowest-index tie-breaking since global index orders by segment)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nseg), 1)
    k_seg = min(k, nseg)
    _, sel_segs = _select_topk_rows(segmax, seg_ids, k_seg, k_seg)  # (B, k_seg)

    onehot = (
        sel_segs[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (b, k_seg, nseg), 2)
    ).astype(jnp.float32)
    gathered = jax.lax.dot_general(
        onehot, s3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # HIGHEST: the default TPU matmul rounds operands to bf16, which
        # corrupts the gathered f32 scores and misranks near-ties. (A 3-term
        # bf16-split with DEFAULT precision is bit-exact too but measured
        # slower: 3 batched matmuls beat 1 only below ~2 passes.)
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, k_seg, LANE)
    g_vals = gathered.reshape(b, k_seg * _LANE)
    col_in_seg = jax.lax.broadcasted_iota(jnp.int32, (b, k_seg, _LANE), 2)
    g_idx = (sel_segs[:, :, None] * _LANE + col_in_seg).reshape(
        b, k_seg * _LANE
    ) + base

    vals = jnp.concatenate([acc_v, g_vals], axis=1)
    idxs = jnp.concatenate([acc_i, g_idx], axis=1)
    return _select_topk_rows(vals, idxs, k, k_pad)


def _topk_kernel(q_ref, c_ref, m_ref, ov_ref, oi_ref, acc_v, acc_i, *, k: int,
                 k_pad: int, block_q: int, block_n: int, n_total: int,
                 segmented: bool):
    """Grid: (c_blocks, q_blocks) — corpus MAJOR, queries minor.

    With q as the fastest axis, one corpus window stays resident in VMEM
    while every query block scores against it, so the corpus streams from
    HBM exactly once per search (q-minor ordering would re-stream the whole
    corpus per query block — 16x the HBM traffic at 2048 queries). The
    running top-k for ALL query blocks lives in one (q_pad, k_pad) scratch,
    indexed by the query-block id.
    """
    cb = pl.program_id(0)
    qb = pl.program_id(1)
    n_cb = pl.num_programs(0)
    row0 = qb * block_q

    @pl.when(cb == 0)
    def _init():
        acc_v[pl.ds(row0, block_q), :] = jnp.full(
            (block_q, k_pad), NEG_INF, acc_v.dtype
        )
        acc_i[pl.ds(row0, block_q), :] = jnp.zeros(
            (block_q, k_pad), acc_i.dtype
        )

    # Score tile on the MXU: (BQ, D) @ (D, BN) -> f32, plus the streamed
    # additive padding mask (0 valid / NEG_INF padding) — one VPU add per
    # element instead of iota + compare + select.
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + m_ref[:]
    base = cb * block_n

    cur_v = acc_v[pl.ds(row0, block_q), :]
    cur_i = acc_i[pl.ds(row0, block_q), :]
    # Merge the running top-k with this tile, reselect top-k.
    if segmented and block_n // _LANE >= k:
        new_v, new_i = _select_topk_segmented(
            scores, base, cur_v, cur_i, k, k_pad
        )
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        vals = jnp.concatenate([cur_v, scores], axis=1)
        idxs = jnp.concatenate([cur_i, col], axis=1)
        new_v, new_i = _select_topk_rows(vals, idxs, k, k_pad)
    acc_v[pl.ds(row0, block_q), :] = new_v
    acc_i[pl.ds(row0, block_q), :] = new_i

    @pl.when(cb == n_cb - 1)
    def _emit():
        ov_ref[:] = new_v
        oi_ref[:] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "interpret", "segmented"),
)
def topk_scores_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    k: int = 10,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: bool = False,
    segmented: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search: returns (values, indices), each (Q, k).

    queries: (Q, D) — padded internally to block_q rows.
    corpus:  (N, D) — streamed in blocks of block_n rows.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    k_pad = _round_up(k, _LANE)
    # The all-query-blocks accumulator lives in VMEM scratch; chunk very
    # large query batches so it stays small (4096 rows -> 4MB).
    max_q = 4096
    if q > max_q:
        parts = [
            topk_scores_pallas(
                queries[s: s + max_q], corpus, k=k, block_q=block_q,
                block_n=block_n, interpret=interpret, segmented=segmented,
            )
            for s in range(0, q, max_q)
        ]
        return (
            jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0),
        )
    q_pad = _round_up(max(q, 8), block_q)
    n_pad = _round_up(n, block_n)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    # Additive padding mask, streamed per corpus block (broadcasts over rows).
    pad_mask = jnp.where(
        jnp.arange(n_pad, dtype=jnp.int32)[None, :] < n, 0.0, NEG_INF
    ).astype(jnp.float32)

    # Grid: corpus-major, query-minor — the corpus window stays in VMEM
    # across the q sweep, so the corpus streams from HBM exactly once.
    grid = (n_pad // block_n, q_pad // block_q)
    out_v, out_i = pl.pallas_call(
        functools.partial(
            _topk_kernel, k=k, k_pad=k_pad, block_q=block_q, block_n=block_n,
            n_total=n, segmented=segmented,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda cb, qb: (cb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda cb, qb: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_pad), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k_pad), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # The in-kernel merge materializes (block_q, k_pad + block_n) f32
            # value+index tiles; the default 16MB scoped-VMEM limit is too
            # small for production block sizes. v5e has 128MB VMEM/core.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d,
            bytes_accessed=q_pad * d * 4 + n_pad * d * 4 + q_pad * k_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus, pad_mask)
    return out_v[:q, :k], out_i[:q, :k]


# --------------------------------------------------------------------------
# Two-pass exact top-k over a SWIZZLED corpus: segment top-k kernel +
# contiguous-block candidate rescore.
#
# The corpus is partitioned into SEGMENTS of L = block_n/128 consecutive
# rows (128 segments per corpus block). The true top-k elements provably
# live in the top-k segments by maximum: if element e's segment ranked
# below k, then k segments each contain an element >= segmax >= e.
#
# Pass A streams a SWIZZLED copy of the corpus (within each block, row
# j*128+s holds natural row s*L+j) so that segment s's score columns all
# land on LANE s — the per-tile segment max is then an elementwise max over
# vreg rows (no cross-lane reduction), and the per-tile merge into the
# running top-k segments is k cheap passes over a (block_q, 256) strip.
# The kernel's non-matmul work is O(1) VPU ops per score.
#
# Pass B (plain XLA, same jit): segment s covers natural rows
# [s*L, (s+1)*L) — CONTIGUOUS — so the candidate gather is k big
# (L, D) block copies per query (jnp.take over a (n_segs, L, D) view),
# not a scattered row gather. Rescore with a small einsum + final top_k.
# Pass-B traffic is Q * k * L rows, independent of N.
# --------------------------------------------------------------------------

def swizzle_corpus(corpus: jax.Array, block_n: int = 8192) -> jax.Array:
    """Precompute the pass-A layout: within each block_n-row block, position
    j*128 + s holds natural row s*L + j (L = block_n/128). Pad to a block
    multiple first (zero rows). One transpose-copy; build it once per index
    (EmbeddingIndex stores it) and pass to ``topk_scores_twopass``.

    block_n MUST match the block_n later passed to ``topk_scores_twopass``
    (same default here) — the layout is block-size-specific and a mismatch
    reads wrong segments. The search asserts the padded shape, which
    catches every mismatch where the two paddings differ."""
    n = corpus.shape[0]
    d = corpus.shape[1]
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    L = block_n // _LANE
    cb = n_pad // block_n
    return (
        corpus.reshape(cb, _LANE, L, d)
        .transpose(0, 2, 1, 3)
        .reshape(n_pad, d)
    )


def _segtopk_kernel(q_ref, c_ref, ov_ref, oi_ref, acc_v, acc_i, *,
                    k_sel: int, block_q: int, block_n: int, n_valid_segs: int,
                    seg_split: int):
    """Grid (c_blocks, q_blocks), corpus-major. c_ref holds the SWIZZLED
    block; lane s of the score tile = lane-group cb*128 + s. Maintains the
    running top-k_sel (segmax value, segment id) per query in VMEM scratch.

    ``seg_split`` subdivides each lane-group of L rows into ``seg_split``
    FINE segments of L/seg_split rows. Under the swizzle, fine segment
    f = seg_split*s + h of block cb covers natural rows
    [f*(L/seg_split), (f+1)*(L/seg_split)) — still contiguous — so pass B's
    per-query candidate traffic shrinks by seg_split× at the cost of a
    seg_split×-wider merge strip here (VPU, cheap next to the matmul).

    Padding needs NO per-element mask pass (a full-tile VPU add would cost
    ~4B of VMEM traffic per score): pad rows are zeros, which can only
    inflate the maximum of the ONE partial segment straddling n — covered
    by over-selecting one extra segment (k_sel = k+1) — while fully-fake
    segments (id >= n_valid_segs) are killed with a (B, 128*seg_split)
    segment-level mask, 1/(L/seg_split) the traffic of an element mask.
    """
    cb = pl.program_id(0)
    qb = pl.program_id(1)
    n_cb = pl.num_programs(0)
    row0 = qb * block_q

    @pl.when(cb == 0)
    def _init():
        acc_v[pl.ds(row0, block_q), :] = jnp.full(
            (block_q, _LANE), NEG_INF, acc_v.dtype
        )
        # distinct negative ids so duplicate-marking in the k-pass selection
        # never aliases a real segment id
        acc_i[pl.ds(row0, block_q), :] = -1 - jax.lax.broadcasted_iota(
            jnp.int32, (block_q, _LANE), 1
        )

    # int8 pass-A variant (pass_a_int8=True): int8 x int8 -> int32 on the
    # MXU at 2x the bf16 rate AND half the corpus HBM/VMEM traffic. The
    # segment max runs in int32 (positive per-row/global scales make the
    # int32 ordering identical to the approximate-score ordering); only the
    # narrow (block_q, 128*seg_split) segmax STRIP converts to f32 —
    # values are < 127*127*d < 2^24, so the conversion is exact and
    # order-preserving. Selection then approximates by the quantization
    # noise only; pass B rescores candidates exactly either way.
    int8_mode = q_ref.dtype == jnp.int8
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
    )
    L = block_n // _LANE
    L2 = L // seg_split
    # fine-segment max: elementwise max across the L2 vreg-rows of each
    # (h, lane) pair; swizzled tile column j*128+s with j = h*L2+j2 scores
    # natural row (cb*128+s)*L + h*L2 + j2 = fine segment seg_split*s+h of
    # this block, element j2
    segmax = jnp.max(
        scores.reshape(block_q, seg_split, L2, _LANE), axis=2
    ).reshape(block_q, seg_split * _LANE)
    if int8_mode:
        segmax = segmax.astype(jnp.float32)
    seg_ids = (
        seg_split * jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seg_split, _LANE), 2)
        + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seg_split, _LANE), 1)
        + cb * (seg_split * _LANE)
    ).reshape(block_q, seg_split * _LANE)
    segmax = jnp.where(seg_ids < n_valid_segs, segmax, NEG_INF)

    cur_v = acc_v[pl.ds(row0, block_q), :]
    cur_i = acc_i[pl.ds(row0, block_q), :]
    vals = jnp.concatenate([cur_v, segmax], axis=1)
    idxs = jnp.concatenate([cur_i, seg_ids], axis=1)
    new_v, new_i = _select_topk_rows(vals, idxs, k_sel, _LANE)
    acc_v[pl.ds(row0, block_q), :] = new_v
    acc_i[pl.ds(row0, block_q), :] = new_i

    @pl.when(cb == n_cb - 1)
    def _emit():
        ov_ref[:] = new_v
        oi_ref[:] = new_i


def _segtopk_kernel_overlap(q_ref, c_ref, ov_ref, oi_ref, acc_v, acc_i, *,
                            k_sel: int, block_q: int, block_n: int,
                            n_valid_segs: int, seg_split: int):
    """Pass-A kernel with MXU/VPU OVERLAP (round-3 attempt at the
    BASELINE.md anatomy gap: segmax was a ~42 ms full-tile VPU pass after
    an ~82 ms matmul).

    Instead of one (block_q, block_n) matmul followed by a monolithic
    segment-max over the 32 MB score tile, the corpus window is processed
    in ``seg_split`` row-slices of L2*128 columns each: a narrow matmul
    produces one fine-segment group's scores and its max reduces
    immediately. Consecutive iterations have no data dependency
    (matmul_{h+1} is independent of max_h), so the VPU reduction of slice
    h can run under the MXU work of slice h+1, and the full score tile is
    never materialized (each slice dies in VMEM). Bit-identical results to
    :func:`_segtopk_kernel` — same segment maxima, same order, same merge.
    """
    cb = pl.program_id(0)
    qb = pl.program_id(1)
    n_cb = pl.num_programs(0)
    row0 = qb * block_q

    @pl.when(cb == 0)
    def _init():
        acc_v[pl.ds(row0, block_q), :] = jnp.full(
            (block_q, _LANE), NEG_INF, acc_v.dtype
        )
        acc_i[pl.ds(row0, block_q), :] = -1 - jax.lax.broadcasted_iota(
            jnp.int32, (block_q, _LANE), 1
        )

    L = block_n // _LANE
    L2 = L // seg_split
    q_tile = q_ref[:]
    parts = []
    for h in range(seg_split):
        c_h = c_ref[pl.ds(h * L2 * _LANE, L2 * _LANE), :]
        scores_h = jax.lax.dot_general(
            q_tile, c_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, L2*128): column j2*128+s of fine segment (h, s)
        parts.append(jnp.max(
            scores_h.reshape(block_q, L2, _LANE), axis=1
        ))  # (block_q, 128)
    segmax = jnp.stack(parts, axis=1).reshape(block_q, seg_split * _LANE)
    seg_ids = (
        seg_split * jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seg_split, _LANE), 2)
        + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seg_split, _LANE), 1)
        + cb * (seg_split * _LANE)
    ).reshape(block_q, seg_split * _LANE)
    segmax = jnp.where(seg_ids < n_valid_segs, segmax, NEG_INF)

    cur_v = acc_v[pl.ds(row0, block_q), :]
    cur_i = acc_i[pl.ds(row0, block_q), :]
    vals = jnp.concatenate([cur_v, segmax], axis=1)
    idxs = jnp.concatenate([cur_i, seg_ids], axis=1)
    new_v, new_i = _select_topk_rows(vals, idxs, k_sel, _LANE)
    acc_v[pl.ds(row0, block_q), :] = new_v
    acc_i[pl.ds(row0, block_q), :] = new_i

    @pl.when(cb == n_cb - 1)
    def _emit():
        ov_ref[:] = new_v
        oi_ref[:] = new_i


def quantize_int8_global(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8: returns (q8, scale). For the pass-A int8
    mode: one positive global scale keeps the int32 segment-max ordering
    identical to the approximate-score ordering with NO dequantization
    inside the kernel."""
    s = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "q_chunk", "interpret",
                     "gather_from_swizzled", "valid_n", "seg_split",
                     "mxu_overlap", "pass_a_int8", "k_sel_extra"),
)
def topk_scores_twopass(
    queries: jax.Array,
    corpus: jax.Array,
    k: int = 10,
    block_q: int = 256,
    block_n: int = 8192,
    q_chunk: int = 256,
    interpret: bool = False,
    corpus_swizzled: Optional[jax.Array] = None,
    gather_from_swizzled: bool = False,
    valid_n: int = -1,
    seg_split: int = 1,
    mxu_overlap: bool = False,
    pass_a_int8: bool = False,
    corpus_swizzled_q8: Optional[jax.Array] = None,
    k_sel_extra: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search, two-pass: (values, indices), (Q, k).

    ``corpus`` is the natural row-major matrix (used by the pass-B rescore);
    ``corpus_swizzled`` the pass-A layout from :func:`swizzle_corpus`
    (computed on the fly when None — one extra corpus copy per call, so
    persistent indexes should precompute it). Requires k < 128.

    ``gather_from_swizzled=True`` is the SINGLE-COPY mode for corpora too
    large to hold twice in HBM (the full-10M-on-one-chip case): pass
    ``corpus=corpus_swizzled`` plus the true row count as ``valid_n``; pass
    B then gathers its k+1 candidate segments as 128-strided rows of the
    swizzled layout (slower gather, half the HBM residency). Returned
    indices are natural row ids in every mode.

    Exactness: the kernel over-selects k+1 segments because the single
    zero-padded partial segment can carry an inflated (score 0) maximum; the
    true top-k segments therefore all survive, and the pass-B rescore masks
    individual pad columns exactly.

    ``seg_split`` (1, 2, 4, ...) subdivides each lane-group into finer
    segments of block_n/128/seg_split rows: pass-B candidate traffic drops
    seg_split× for a slightly wider in-kernel merge. Exact for any value
    (the top-k-in-top-k-segments argument holds for every segmentation,
    and exactly one fine segment straddles n).

    ``pass_a_int8=True`` (opt-in, STATISTICALLY exact): pass A runs on an
    int8-quantized corpus (provide ``corpus_swizzled_q8`` from
    ``quantize_int8_global(swizzled)``; queries are quantized per-row on
    the fly) — 2x MXU rate and half the corpus stream. Segment SELECTION
    then carries the quantization noise (p99 ~0.002 cosine at d=384,
    tools/probe_int8_passa.py), compensated by over-selecting
    ``k_sel_extra`` extra segments (default 5 in this mode — the host
    simulation covers 100% of queries at +3 with double margin at +5);
    pass B rescores candidates EXACTLY either way, so errors can only be
    missed candidates, never wrong scores. The deterministically CERTIFIED
    variant (int8+residual second matmul, the bm25_tpu.py pattern) was
    measured and rejected: the residual pass doubles pass-A matmul time,
    projecting 0.65-0.82x of the bf16 headline (probe_int8_passa.py;
    ROADMAP.md r4 note).
    """
    assert k < _LANE, f"segment top-k supports k < {_LANE}, got {k}"
    q, d = queries.shape
    # The all-query-blocks running-top-k scratch is (q_pad, 128) f32+i32 in
    # VMEM: 65536 queries = 64MB, which blows the 100MB scoped limit once
    # the corpus window + score tile join it (measured OOM on v5e). Chunk
    # very large batches; 32768 is the measured sweet spot anyway.
    if gather_from_swizzled:
        # single-copy mode scores the PADDED swizzled layout: without the
        # true row count, zero pad rows (score 0.0) would be returned as
        # real documents for queries whose true top-k is negative
        assert valid_n >= 0, (
            "gather_from_swizzled=True requires valid_n (the true corpus "
            "row count) — the padded layout's zero rows are not documents"
        )
    max_q = _MAX_TWOPASS_Q
    if q > max_q:
        if corpus_swizzled is None and not gather_from_swizzled:
            # swizzle ONCE here — otherwise every chunk would rebuild the
            # full-corpus pass-A layout
            corpus_swizzled = swizzle_corpus(corpus, block_n)
        if pass_a_int8 and corpus_swizzled_q8 is None:
            # in single-copy (gather_from_swizzled) mode the swizzled layout
            # arrives via `corpus` and corpus_swizzled stays None here —
            # quantize whichever holds the layout; if neither does yet, the
            # per-chunk calls quantize from their resolved layout
            _q8_src = corpus_swizzled if corpus_swizzled is not None else (
                corpus if gather_from_swizzled else None)
            if _q8_src is not None:
                corpus_swizzled_q8, _ = quantize_int8_global(_q8_src)
        if not gather_from_swizzled:
            # pad the natural layout once too: the per-chunk calls would
            # otherwise each recompute the full-corpus jnp.pad copy
            if valid_n < 0:
                valid_n = corpus.shape[0]
            full_pad = _round_up(valid_n, block_n) - corpus.shape[0]
            if full_pad > 0:
                corpus = jnp.pad(corpus, ((0, full_pad), (0, 0)))
        parts = [
            topk_scores_twopass(
                queries[s: s + max_q], corpus, k=k, block_q=block_q,
                block_n=block_n, q_chunk=q_chunk, interpret=interpret,
                corpus_swizzled=corpus_swizzled,
                gather_from_swizzled=gather_from_swizzled,
                valid_n=valid_n, seg_split=seg_split,
                mxu_overlap=mxu_overlap, pass_a_int8=pass_a_int8,
                corpus_swizzled_q8=corpus_swizzled_q8,
                k_sel_extra=k_sel_extra,
            )
            for s in range(0, q, max_q)
        ]
        return (
            jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0),
        )
    n = valid_n if valid_n >= 0 else corpus.shape[0]
    n_pad = _round_up(n, block_n)
    q_pad = _round_up(max(q, 8), block_q)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    if gather_from_swizzled:
        if corpus_swizzled is None:
            corpus_swizzled = corpus
        assert corpus_swizzled.shape[0] == n_pad, (
            "single-copy mode expects the swizzled (padded) layout"
        )
    elif corpus_swizzled is None:
        corpus_swizzled = swizzle_corpus(corpus, block_n)
    else:
        assert corpus_swizzled.shape[0] == n_pad, (
            f"corpus_swizzled has {corpus_swizzled.shape[0]} rows but this "
            f"block_n={block_n} pads the corpus to {n_pad} — it was built "
            "with a different block_n (swizzle_corpus and "
            "topk_scores_twopass must use the same value)"
        )
    if not gather_from_swizzled and n_pad != corpus.shape[0]:
        corpus = jnp.pad(corpus, ((0, n_pad - corpus.shape[0]), (0, 0)))

    L = block_n // _LANE
    assert L % seg_split == 0 and L >= seg_split, (
        f"seg_split={seg_split} must divide block_n/128={L}"
    )
    L2 = L // seg_split  # rows per (fine) segment
    c_blocks = n_pad // block_n
    n_valid_segs = -(-n // L2)  # segments containing at least one real row
    if pass_a_int8 and k_sel_extra == 0:
        k_sel_extra = 5  # noise margin: host sim covers 100% at +3
    k_sel = min(k + 1 + k_sel_extra, _LANE)
    if pass_a_int8:
        # the statistical-exactness contract (host sim: k_sel = k+4 covers
        # 100% of queries) must degrade LOUDLY, not silently (ADVICE r4):
        if k + 1 + k_sel_extra > _LANE:
            warnings.warn(
                f"pass_a_int8: k_sel clamped to the {_LANE}-lane scratch "
                f"(k={k}, k_sel_extra={k_sel_extra}) — the int8 noise margin "
                f"shrinks to {_LANE - 1 - k} segments; recall may drop "
                "below the host-simulated coverage", stacklevel=2)
        if d >= 1040:
            warnings.warn(
                f"pass_a_int8: d={d} >= 1040 — the int32 segment max can "
                "exceed 2^24 (127*127*d) and its f32 conversion is no "
                "longer exact; segment ordering may perturb selection",
                stacklevel=2)

    pass_a_q = queries
    pass_a_c = corpus_swizzled
    if pass_a_int8:
        if corpus_swizzled_q8 is None:
            corpus_swizzled_q8, _ = quantize_int8_global(corpus_swizzled)
        assert corpus_swizzled_q8.dtype == jnp.int8
        assert corpus_swizzled_q8.shape == corpus_swizzled.shape or \
            gather_from_swizzled is False
        sq = jnp.maximum(
            jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0, 1e-12)
        pass_a_q = jnp.clip(
            jnp.round(queries.astype(jnp.float32) / sq), -127, 127
        ).astype(jnp.int8)
        pass_a_c = corpus_swizzled_q8

    assert not (pass_a_int8 and mxu_overlap), (
        "pass_a_int8 and mxu_overlap are mutually exclusive (the overlap "
        "kernel was a measured dead end; it has no int8 variant)")
    grid = (c_blocks, q_pad // block_q)
    kernel_fn = _segtopk_kernel_overlap if mxu_overlap else _segtopk_kernel
    _, seg_ids_full = pl.pallas_call(
        functools.partial(
            kernel_fn, k_sel=k_sel, block_q=block_q, block_n=block_n,
            n_valid_segs=n_valid_segs, seg_split=seg_split,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda cb, qb: (cb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, _LANE), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, _LANE), lambda cb, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, _LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_pad, _LANE), jnp.float32),
            pltpu.VMEM((q_pad, _LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d,
            bytes_accessed=q_pad * d * 4 + n_pad * d * 4 + q_pad * _LANE * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pass_a_q, pass_a_c)
    seg_ids = seg_ids_full[:, :k_sel]  # (q_pad, k_sel) top segment ids

    # ---- pass B: candidate gather + exact rescore (XLA) ----
    # segment s covers natural rows [s*L2, (s+1)*L2); ids < 0 are "fewer than
    # k_sel real segments" placeholders (only when n <= ~k*L2)
    seg_safe = jnp.maximum(seg_ids, 0)
    j_off = jnp.arange(L2, dtype=jnp.int32)[None, None, :]
    cand_rows = seg_safe[:, :, None] * L2 + j_off  # natural row ids
    cand_cols = cand_rows.reshape(q_pad, k_sel * L2)
    cand_valid = (
        (seg_ids[:, :, None] >= 0) & (cand_rows < n)
    ).reshape(q_pad, k_sel * L2)
    if not gather_from_swizzled:
        corpus_segs = corpus.reshape(n_pad // L2, L2, d)
    else:
        # natural row r sits at swizzled position
        # (r//block_n)*block_n + (w % L)*128 + w//L with w = r % block_n
        # (within each block, position j*128+s holds natural row s*L+j)
        w = cand_rows % block_n
        cand_swz = (
            (cand_rows // block_n) * block_n
            + (w % L) * _LANE
            + w // L
        ).reshape(q_pad, k_sel * L2)

    out_v = []
    out_i = []
    for s in range(0, q_pad, q_chunk):
        e = min(s + q_chunk, q_pad)
        if gather_from_swizzled:
            blocks = jnp.take(corpus_swizzled, cand_swz[s:e], axis=0)
            scores = jnp.einsum(
                "qcd,qd->qc", blocks, queries[s:e],
                preferred_element_type=jnp.float32,
            )
        else:
            blocks = jnp.take(corpus_segs, seg_safe[s:e], axis=0)
            scores = jnp.einsum(
                "qkld,qd->qkl", blocks, queries[s:e],
                preferred_element_type=jnp.float32,
            ).reshape(e - s, k_sel * L2)
        scores = jnp.where(cand_valid[s:e], scores, NEG_INF)
        v, sel = jax.lax.top_k(scores, k)
        out_v.append(v)
        out_i.append(jnp.take_along_axis(cand_cols[s:e], sel, axis=1))
    vals = jnp.concatenate(out_v, axis=0)[:q]
    idx = jnp.concatenate(out_i, axis=0)[:q].astype(jnp.int32)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "block_n"))
def topk_scores_ref(
    queries: jax.Array, corpus: jax.Array, k: int = 10, block_n: int = 4096
) -> Tuple[jax.Array, jax.Array]:
    """Reference implementation: scan over corpus blocks with lax.top_k merge.

    Used for correctness tests and as the CPU fallback. Never materializes the
    full score matrix either, but relies on XLA's top_k instead of the fused
    in-kernel selection.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    blocks = corpus.reshape(n_pad // block_n, block_n, d)

    def step(carry, blk_and_off):
        best_v, best_i = carry
        blk, off = blk_and_off
        scores = jnp.einsum(
            "qd,nd->qn", queries, blk, preferred_element_type=jnp.float32
        )
        col = jnp.arange(block_n, dtype=jnp.int32)[None, :] + off
        scores = jnp.where(col < n, scores, NEG_INF)
        vals = jnp.concatenate([best_v, scores], axis=1)
        idxs = jnp.concatenate([best_i, jnp.broadcast_to(col, scores.shape)], axis=1)
        v, sel = jax.lax.top_k(vals, k)
        i = jnp.take_along_axis(idxs, sel, axis=1)
        return (v, i), None

    init = (
        jnp.full((q, k), NEG_INF, jnp.float32),
        jnp.zeros((q, k), jnp.int32),
    )
    offsets = jnp.arange(n_pad // block_n, dtype=jnp.int32) * block_n
    (vals, idx), _ = jax.lax.scan(step, init, (blocks, offsets))
    return vals, idx


def topk_scores(
    queries: jax.Array, corpus: jax.Array, k: int = 10, **kw
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere."""
    if jax.default_backend() == "tpu":
        return topk_scores_pallas(queries, corpus, k=k, **kw)
    return topk_scores_ref(queries, corpus, k=k)


# ---- staged exact block selection + chunked wide-k scoring (pure XLA) ----
#
# The segment kernels above keep their running top-k in a 128-lane VMEM
# scratch, so they support k < 128 — the retrieval regime. The hybrid serve
# path also needs EXACT top-k at k >= 128 (RRF fuses depth = 4*k candidate
# lists, reference behavior `Tool/rank_chunks_optimized.py:225-239`), where
# the fused kernel's per-tile k*128-wide merges get expensive. At serve-sized
# query batches the idiomatic XLA alternative wins: a column-chunked matmul
# whose (Q, chunk) score tiles are reduced immediately by a staged exact
# block selection, so the corpus-width score matrix never materializes.
# ``block_topk`` is that selection; the device-BM25 leg
# (``index/bm25_tpu.py``) shares it.

SEL_BLOCK = 256        # stage-2 block width (score cols pad to this)
SEL_SUB = 32           # stage-3 sub-block width inside the gathered tile
SEL_STAGE3_MIN = 8192  # engage stage 3 only when the gathered tile is wide


def block_topk(S: jax.Array, kp: int) -> Tuple[jax.Array, jax.Array]:
    """EXACT top-kp over huge rows without a full-width sort.

    ``lax.top_k`` over a (Q, 1M) score matrix costs a full-row sort on TPU;
    this staged selection is exact and touches far less: (1) per-block max
    (fused with the matmul's output pass), (2) top-(kp+8) BLOCKS by max,
    (3) the same max->select->gather applied ONCE MORE inside the gathered
    tile over ``SEL_SUB``-wide sub-blocks when the tile is wide
    (>= ``SEL_STAGE3_MIN`` columns — the tile sort dominated the serve
    scoring loop's VPU time), (4) exact top-kp over what remains.

    Correctness of each stage (identical argument at both levels): let e be
    an element of the true top-kp under the lower-id tie policy, in block b.
    If b is not among the kept ``kp+8`` blocks, every kept block has
    (max > e) or (max == e and lower block id) — the former each contain an
    element strictly greater than e, the latter an element equal to e at a
    lower global id (ids ascend with block order after the sort below).
    Either way each kept block contributes one element ranking ahead of e,
    so >= kp+8 > kp elements beat e — contradiction. The +8 is margin, not
    a correctness requirement. Ties: kept ids are sorted ascending before
    the gather and ``lax.top_k`` keeps the FIRST of equal values, so the
    kp-boundary tie resolves to the lower column id at every stage.

    Returns (vals, column indices), both (Q, kp).
    """
    Q, Dp = S.shape
    if Dp <= 4 * SEL_BLOCK or Dp % SEL_BLOCK:
        return jax.lax.top_k(S, kp)
    nb = Dp // SEL_BLOCK
    Sb = S.reshape(Q, nb, SEL_BLOCK)
    m = min(nb, kp + 8)
    _, tb = jax.lax.top_k(Sb.max(axis=2), m)            # (Q, m) block ids
    tb = jnp.sort(tb, axis=1)  # ascending ids BEFORE the gather (ties)
    G = jnp.take_along_axis(Sb, tb[:, :, None], axis=1)  # (Q, m, bs)
    width = m * SEL_BLOCK
    Gf = G.reshape(Q, width)
    if width < SEL_STAGE3_MIN or SEL_BLOCK % SEL_SUB:
        vals, loc = jax.lax.top_k(Gf, kp)
    else:
        # stage 3: sub-block max -> top sub-blocks -> narrow exact sort.
        # Gathered columns ascend in global id (tb sorted), so sub-block
        # order inside Gf is already the global id order the tie policy
        # needs; sorting ts keeps it after the second gather.
        ns = width // SEL_SUB
        Gs = Gf.reshape(Q, ns, SEL_SUB)
        ms = min(ns, kp + 8)
        _, ts = jax.lax.top_k(Gs.max(axis=2), ms)       # (Q, ms) sub ids
        ts = jnp.sort(ts, axis=1)
        G2 = jnp.take_along_axis(Gs, ts[:, :, None], axis=1)
        vals, l2 = jax.lax.top_k(G2.reshape(Q, ms * SEL_SUB), kp)
        sub = jnp.take_along_axis(ts, l2 // SEL_SUB, axis=1)
        loc = sub * SEL_SUB + (l2 % SEL_SUB)
    block = jnp.take_along_axis(tb, loc // SEL_BLOCK, axis=1)
    return vals, block * SEL_BLOCK + (loc % SEL_BLOCK)


def topk_scores_chunked(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    chunk: int = 262144,
    valid_n: int = -1,
    score_budget_bytes: int = 1 << 30,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k scoring for WIDE k (>= 128) at serve-sized query batches.

    Column-chunked ``Q @ C.T`` (one MXU einsum per chunk, f32 accumulation;
    the contraction axis is never split, so each score is one full-depth
    dot — equal to :func:`topk_scores_ref` up to the backend gemm's
    accumulation order, and exactly equal whenever dots are exactly
    representable) with :func:`block_topk` reducing each (Q, chunk)
    tile to its top-k immediately; a running ``lax.top_k`` merge keeps the
    candidate set at (Q, k). Peak transient HBM is one score tile, capped at
    ``score_budget_bytes`` by shrinking the chunk for larger query batches.
    Ties: chunks ascend and the merge concatenates [running, new], so the
    lower row id wins at every boundary — same policy as the segment
    kernels and ``topk_scores_ref``.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    vn = n if valid_n < 0 else valid_n
    k_eff = min(k, n)
    # fit the f32 score tile in budget; keep SEL_BLOCK alignment
    max_chunk = max(SEL_BLOCK, score_budget_bytes // (4 * max(q, 1)))
    chunk = min(chunk, _round_up(max_chunk, SEL_BLOCK) - SEL_BLOCK
                if max_chunk % SEL_BLOCK else max_chunk)
    chunk = max(SEL_BLOCK, chunk - chunk % SEL_BLOCK)

    def score(rows_slice, off):
        s = jnp.einsum("qd,nd->qn", queries, rows_slice,
                       preferred_element_type=jnp.float32)
        col = jnp.arange(rows_slice.shape[0], dtype=jnp.int32)[None, :] + off
        return jnp.where(col < vn, s, NEG_INF)

    def sel(S, off, kp):
        # every call site clamps kp to the slice width (k_eff <= n for the
        # single-chunk path, min(k_eff, chunk/rem) in the loop), so the
        # selection never over-asks
        assert kp <= S.shape[1], (kp, S.shape)
        v, i = block_topk(S, kp)
        return v, (i + off).astype(jnp.int32)

    if n <= chunk:
        vals, idx = sel(score(corpus, 0), 0, k_eff)
    else:
        nfull, rem = divmod(n, chunk)

        def merge(run, new):
            av = jnp.concatenate([run[0], new[0]], axis=1)
            ai = jnp.concatenate([run[1], new[1]], axis=1)
            mv, s = jax.lax.top_k(av, k_eff)
            return mv, jnp.take_along_axis(ai, s, axis=1)

        def body(i, carry):
            off = i * chunk
            rows = jax.lax.dynamic_slice_in_dim(corpus, off, chunk, axis=0)
            return merge(carry, sel(score(rows, off), off, min(k_eff, chunk)))

        init = (jnp.full((q, k_eff), NEG_INF, jnp.float32),
                jnp.zeros((q, k_eff), jnp.int32))
        vals, idx = jax.lax.fori_loop(0, nfull, body, init)
        if rem:
            off = nfull * chunk
            tail = jax.lax.dynamic_slice_in_dim(corpus, off, rem, axis=0)
            vals, idx = merge((vals, idx),
                              sel(score(tail, off), off, min(k_eff, rem)))
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)),
                       constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx
