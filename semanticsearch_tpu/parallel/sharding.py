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
    """Zero-pad to a multiple of n_shards (and of n_shards*align when
    ``align`` > 1, so every shard's row count is align-divisible — required
    for the cached per-shard swizzled layout to equal the global swizzle)."""
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

    Requires shard_rows % block_n == 0 (use ``pad_to_shards(align=block_n)``)
    so swizzle blocks never cross shard boundaries — then each device
    transposes only its local rows (no collectives) and the cached result
    feeds ``sharded_topk(..., corpus_swizzled_sharded=...)``.
    """
    from ..ops.topk import swizzle_corpus

    n_total = corpus_sharded.shape[0]
    n_shards = _n_row_shards(mesh)
    shard_rows = n_total // n_shards
    assert shard_rows % block_n == 0, (
        f"shard_rows={shard_rows} must divide block_n={block_n}; pad with "
        "pad_to_shards(align=block_n)"
    )

    def local(c_local):
        return swizzle_corpus(c_local, block_n)

    axes = _row_axes(mesh)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=P(axes, None), out_specs=P(axes, None),
        check_vma=False,
    ))(corpus_sharded)


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
    n_total = corpus_sharded.shape[0]
    shard_rows = n_total // mesh.shape["data"]
    # Pad rows (zero vectors, score 0) can outrank real candidates with
    # negative scores INSIDE the padded shard's local selection. Request
    # k + n_pad local candidates so that after masking pads to -inf every
    # shard still contributes its true local top-k.
    n_pad = 0 if valid_n < 0 else n_total - valid_n
    k_local = min(shard_rows, k + n_pad)
    use_twopass = use_pallas and impl == "twopass" and k_local < 128
    have_cached_swz = corpus_swizzled_sharded is not None

    def local_search(q, c_local, *c_swz):
        # c_local: (shard_rows, D) — this device's corpus rows.
        my_shard = jax.lax.axis_index("data")
        base = my_shard * shard_rows
        if use_twopass:
            # with a cached per-shard swizzle this is transpose-free; else
            # the swizzle is rebuilt per call (opt-in cost)
            vals, idx = topk_scores_twopass(
                q, c_local, k=k_local, block_n=block_n,
                interpret=interpret, seg_split=seg_split,
                corpus_swizzled=c_swz[0] if have_cached_swz else None,
            )
        elif use_pallas:
            vals, idx = topk_scores_pallas(q, c_local, k=k_local,
                                           interpret=interpret)
        else:
            vals, idx = topk_scores_ref(q, c_local, k=k_local)
        gidx = idx + base
        if valid_n >= 0:
            vals = jnp.where(gidx < valid_n, vals, -jnp.inf)
        # Gather all shards' candidates: (n_shards, Q, k) -> (Q, n_shards*k)
        all_vals = jax.lax.all_gather(vals, "data")
        all_idx = jax.lax.all_gather(gidx, "data")
        q_n = q.shape[0]
        all_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q_n, -1)
        all_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, -1)
        best_v, sel = jax.lax.top_k(all_vals, k)
        best_i = jnp.take_along_axis(all_idx, sel, axis=1)
        return best_v, best_i

    args = (queries, corpus_sharded)
    in_specs = [P(), P("data", None)]
    if have_cached_swz:
        args = args + (corpus_swizzled_sharded,)
        in_specs.append(P("data", None))
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
    n_total = corpus_sharded.shape[0]
    n_dcn = mesh.shape["dcn"]
    n_data = mesh.shape["data"]
    shard_rows = n_total // (n_dcn * n_data)
    n_pad = 0 if valid_n < 0 else n_total - valid_n
    k_local = min(shard_rows, k + n_pad)
    use_twopass = use_pallas and impl == "twopass" and k_local < 128
    have_cached_swz = corpus_swizzled_sharded is not None

    def local_search(q, c_local, *c_swz):
        # global row base: dcn-major, data-minor (matches P(("dcn","data")))
        my_shard = (
            jax.lax.axis_index("dcn") * n_data + jax.lax.axis_index("data")
        )
        base = my_shard * shard_rows
        if use_twopass:
            vals, idx = topk_scores_twopass(
                q, c_local, k=k_local, block_n=block_n,
                interpret=interpret, seg_split=seg_split,
                corpus_swizzled=c_swz[0] if have_cached_swz else None,
            )
        elif use_pallas:
            vals, idx = topk_scores_pallas(q, c_local, k=k_local,
                                           interpret=interpret)
        else:
            vals, idx = topk_scores_ref(q, c_local, k=k_local)
        gidx = idx + base
        if valid_n >= 0:
            vals = jnp.where(gidx < valid_n, vals, -jnp.inf)
        q_n = q.shape[0]

        def gather_select(v, i, axis, kk):
            av = jax.lax.all_gather(v, axis)   # (axis_size, Q, k_in)
            ai = jax.lax.all_gather(i, axis)
            av = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
            ai = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
            bv, sel = jax.lax.top_k(av, kk)
            return bv, jnp.take_along_axis(ai, sel, axis=1)

        # level 1: merge the slice's shards over ICI
        vals, gidx = gather_select(vals, gidx, "data", k)
        # level 2: one exchange of per-slice winners over DCN
        return gather_select(vals, gidx, "dcn", k)

    args = (queries, corpus_sharded)
    in_specs = [P(), P(("dcn", "data"), None)]
    if have_cached_swz:
        args = args + (corpus_swizzled_sharded,)
        in_specs.append(P(("dcn", "data"), None))
    return shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)
