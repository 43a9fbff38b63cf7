"""Sharded exact top-k retrieval over an ICI device mesh.

The reference has no corpus sharding — it re-embeds and scores per-query pandas
groups in host process pools (``Tool/rank_chunks_optimized.py:539-601``). Here
the corpus embedding matrix lives HBM-resident, row-sharded over the ``data``
axis of the mesh. A query batch is replicated; each device runs the fused
matmul+top-k kernel on its local shard; per-shard candidates (score, global id)
are all-gathered over ICI and re-selected. Communication is O(devices * Q * k),
never the corpus.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.topk import (
    _LANE,
    topk_scores_chunked,
    topk_scores_pallas,
    topk_scores_ref,
    topk_scores_twopass,
)


def _row_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Row-sharding axes: ("dcn", "data") on a hybrid mesh, else ("data",)."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def _n_row_shards(mesh: Mesh) -> int:
    n = 1
    for ax in _row_axes(mesh):
        n *= mesh.shape[ax]
    return n


def shard_corpus(emb: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a (N, D) embedding matrix row-sharded over the data axis (and
    the dcn axis too on a hybrid mesh, dcn-major row order).

    N must be divisible by the shard count; pad with zero rows first if
    needed and pass the true row count as ``valid_n`` to ``sharded_topk``
    (zero pad rows score 0, which can BEAT real candidates with negative
    cosine — they must be excluded, not just assumed to lose).
    """
    return jax.device_put(
        emb, NamedSharding(mesh, P(_row_axes(mesh), None))
    )


def pad_to_shards(emb: jax.Array, mesh: Mesh,
                  align: int = 1) -> Tuple[jax.Array, int]:
    """Zero-pad to a multiple of n_shards (times ``align`` when > 1).

    Keep ``align`` at 1: pad rows score 0.0 and force every shard to
    over-select ``k + n_pad`` local candidates for exactness (they can
    displace real candidates with negative scores inside the local top-k),
    so n_pad must stay < n_shards. Kernel-block alignment of the shard is
    NOT needed — each shard's two-pass kernel pads internally and masks
    its own pad segments exactly (``topk_scores_twopass`` n_valid_segs /
    cand_rows < n). ``align`` survives for layouts that need it; the cost
    is on the caller."""
    n_shards = _n_row_shards(mesh)
    step = n_shards * max(1, align)
    n = emb.shape[0]
    pad = (-n) % step
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
    return emb, n


def swizzle_corpus_sharded(corpus_sharded: jax.Array, mesh: Mesh,
                           block_n: int = 8192) -> jax.Array:
    """Per-shard pass-A layout for the two-pass kernel, kept row-sharded.

    Each device swizzles only its local rows (no collectives), padding them
    internally to a ``block_n`` multiple (``swizzle_corpus`` does); the
    cached result feeds ``sharded_topk(..., corpus_swizzled_sharded=...)``,
    whose local two-pass call masks the per-shard internal pad exactly.
    The output is sharded with uniform per-device shape
    ``round_up(shard_rows, block_n)``.
    """
    from ..ops.topk import swizzle_corpus

    def local(c_local):
        return swizzle_corpus(c_local, block_n)

    axes = _row_axes(mesh)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=P(axes, None), out_specs=P(axes, None),
        check_vma=False,
    ))(corpus_sharded)


def _sharded_topk_impl(
    queries, corpus_sharded, mesh, k, valid_n, use_pallas, impl,
    interpret, corpus_swizzled_sharded, block_n, seg_split,
):
    """Shared body of :func:`sharded_topk` / :func:`sharded_topk_2level`:
    per-shard local top-k, then one gather+re-select per row axis, merged
    minor-to-major (ICI before DCN). The flat merge is the one-axis case."""
    axes = _row_axes(mesh)
    n_total = corpus_sharded.shape[0]
    n_shards = _n_row_shards(mesh)
    shard_rows = n_total // n_shards
    # Pad rows (zero vectors, score 0) can outrank real candidates with
    # negative scores INSIDE a shard's local selection; over-select
    # k + n_pad locally so every shard still contributes its true local
    # top-k after the pads mask to -inf. pad_to_shards keeps n_pad below
    # n_shards, so this stays a few extra candidates — NOT a selection
    # width that would blow the kernels (a block-aligned global pad once
    # pushed k_local into the tens of thousands here, unrolling the fused
    # kernel's selection loop at trace time).
    n_pad = 0 if valid_n < 0 else n_total - valid_n
    k_local = min(shard_rows, k + n_pad)
    use_twopass = (use_pallas and impl == "twopass" and k_local < _LANE)
    have_cached_swz = corpus_swizzled_sharded is not None

    def local_search(q, c_local, *c_swz):
        # c_local: (shard_rows, D) — this device's corpus rows; global row
        # base follows the axes-major row order of P(axes, None)
        my_shard = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            my_shard = my_shard * mesh.shape[ax] + jax.lax.axis_index(ax)
        base = my_shard * shard_rows
        if use_twopass:
            # with a cached per-shard swizzle this is transpose-free; else
            # the swizzle is rebuilt per call (opt-in cost). The kernel
            # masks its own internal block padding (shard_rows need not be
            # block_n-aligned).
            vals, idx = topk_scores_twopass(
                q, c_local, k=k_local, block_n=block_n,
                interpret=interpret, seg_split=seg_split,
                corpus_swizzled=c_swz[0] if have_cached_swz else None,
            )
        elif use_pallas and k_local >= _LANE and q.shape[0] <= 8192:
            # wide-k candidate depths (k_local beyond the segment kernels'
            # 128-lane scratch) at serve-sized query batches: the
            # column-chunked XLA matmul + staged block selection beats the
            # fused kernel's k*128-wide per-tile merges, same dispatch rule
            # as the single-chip engine (engine.search_device)
            vals, idx = topk_scores_chunked(q, c_local, k=k_local)
        elif use_pallas:
            vals, idx = topk_scores_pallas(q, c_local, k=k_local,
                                           interpret=interpret)
        else:
            vals, idx = topk_scores_ref(q, c_local, k=k_local)
        gidx = idx + base
        if valid_n >= 0:
            vals = jnp.where(gidx < valid_n, vals, -jnp.inf)
        q_n = q.shape[0]

        def gather_select(v, i, axis):
            av = jax.lax.all_gather(v, axis)   # (axis_size, Q, k_in)
            ai = jax.lax.all_gather(i, axis)
            av = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
            ai = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
            bv, sel = jax.lax.top_k(av, k)
            return bv, jnp.take_along_axis(ai, sel, axis=1)

        # merge minor-to-major: the fast/near network first, so each outer
        # axis carries only already-merged k-candidate lists
        for ax in reversed(axes):
            vals, gidx = gather_select(vals, gidx, ax)
        return vals, gidx

    args = (queries, corpus_sharded)
    in_specs = [P(), P(axes, None)]
    if have_cached_swz:
        args = args + (corpus_swizzled_sharded,)
        in_specs.append(P(axes, None))
    return shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "valid_n", "use_pallas", "impl",
                     "interpret", "block_n", "seg_split"),
)
def sharded_topk(
    queries: jax.Array,
    corpus_sharded: jax.Array,
    mesh: Mesh,
    k: int = 10,
    valid_n: int = -1,
    use_pallas: bool = False,
    impl: str = "fused",
    interpret: bool = False,
    corpus_swizzled_sharded: Optional[jax.Array] = None,
    block_n: int = 8192,
    seg_split: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded corpus. Returns (values, global indices).

    queries:        (Q, D), replicated.
    corpus_sharded: (N, D) with N divisible by the data-axis size, sharded
                    with PartitionSpec("data", None).
    valid_n:        true corpus size if the corpus was padded (-1: no padding).
    corpus_swizzled_sharded: cached per-shard pass-A layout from
                    :func:`swizzle_corpus_sharded` — when given (with
                    impl="twopass"), each shard runs the faster two-pass
                    segment kernel with no per-call transpose.
    """
    assert "dcn" not in mesh.axis_names, (
        "use sharded_topk_2level on ('dcn', 'data') hybrid meshes"
    )
    return _sharded_topk_impl(
        queries, corpus_sharded, mesh, k, valid_n, use_pallas, impl,
        interpret, corpus_swizzled_sharded, block_n, seg_split,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "valid_n", "use_pallas", "impl",
                     "interpret", "block_n", "seg_split"),
)
def sharded_topk_2level(
    queries: jax.Array,
    corpus_sharded: jax.Array,
    mesh: Mesh,
    k: int = 10,
    valid_n: int = -1,
    use_pallas: bool = False,
    impl: str = "fused",
    interpret: bool = False,
    corpus_swizzled_sharded: Optional[jax.Array] = None,
    block_n: int = 8192,
    seg_split: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """DCN-aware exact top-k over a corpus sharded on a 2-level mesh.

    ``mesh`` must have axes ("dcn", "data"): ``data`` rides ICI within a
    slice, ``dcn`` crosses slices (``core.mesh.hybrid_mesh``). The corpus is
    row-sharded over BOTH axes (PartitionSpec(("dcn", "data"), None),
    dcn-major row order). The merge is hierarchical: per-shard local top-k →
    all_gather + re-select WITHIN the slice (ICI) → one all_gather of each
    slice's k winners over DCN → final re-select. DCN traffic is
    O(n_slices · Q · k) instead of the flat merge's
    O(n_slices · n_data · Q · k) — the slow network carries only
    already-merged candidates. Results are bit-identical to the flat merge.
    """
    assert "dcn" in mesh.axis_names and "data" in mesh.axis_names, (
        "sharded_topk_2level needs a ('dcn', 'data') mesh; "
        "use sharded_topk on single-slice meshes"
    )
    return _sharded_topk_impl(
        queries, corpus_sharded, mesh, k, valid_n, use_pallas, impl,
        interpret, corpus_swizzled_sharded, block_n, seg_split,
    )
