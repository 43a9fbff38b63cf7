"""Sentence-similarity math for chunking: normalize, sim matrix, rank matrix.

TPU-native replacements for the reference's similarity plumbing:

- ``l2_normalize`` + ``similarity_matrix``: the reference builds ``E @ E.T`` on
  whatever torch device is available (``Method/semantic_common.py:144-191``).
  Here it is one XLA matmul on the MXU; for matrices beyond VMEM a Pallas
  blockwise kernel (``similarity_matrix_pallas``) tiles it explicitly.
- ``rank_matrix_global``: the reference computes, for every (i, j), how many
  entries of row i and column j are smaller than S[i,j] via an O(n^3) broadcast
  compare (``Method/Semantic_Splitter_Optimized.py:189-192``). Rank-in-row is
  just the position in the row's sort order, so we compute it with a double
  argsort — O(n^2 log n) with XLA's sort, no giant intermediate.
- ``rank_matrix_local``: C99's original local-mask rank (fraction of a
  (mask x mask) window around (i,j) smaller than S[i,j],
  ``Semantic_Splitter_Optimized.py:171-186``), vectorized via shifted-window
  accumulation instead of the reference's per-element Python loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-9) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@jax.jit
def similarity_matrix(emb: jax.Array) -> jax.Array:
    """Cosine similarity matrix of L2-normalized embeddings.

    Full-precision accumulate: segmentation boundary decisions are sensitive
    to small similarity differences, so this op requests HIGHEST precision
    (n is at most a few thousand sentences — the matmul cost is negligible).
    """
    return jnp.einsum(
        "id,jd->ij", emb, emb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _sim_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def similarity_matrix_pallas(
    emb: jax.Array, block: int = 512, interpret: bool = False
) -> jax.Array:
    """Blockwise E @ E.T for similarity matrices larger than VMEM."""
    n, d = emb.shape
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block, n_pad // block)
    out = pl.pallas_call(
        _sim_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(emb, emb)
    return out[:n, :n]


@jax.jit
def adjacent_similarities(emb: jax.Array) -> jax.Array:
    """Cosine similarity of consecutive sentence pairs: (n-1,) vector."""
    return jnp.sum(
        (emb[:-1] * emb[1:]).astype(jnp.float32), axis=-1
    )


def analyze_similarity_distribution(s) -> dict:
    """Percentile stats of the upper-triangle similarities (reference:
    ``Method/semantic_common.py:250-288``) — used for auto-parameter
    derivation diagnostics and data-quality reports."""
    import numpy as np

    s = np.asarray(s)
    n = s.shape[0]
    if n < 2:
        return {"count": 0}
    vals = s[np.triu_indices(n, 1)]
    return {
        "count": int(vals.size),
        "mean": float(vals.mean()),
        "std": float(vals.std()),
        "min": float(vals.min()),
        "max": float(vals.max()),
        "p10": float(np.percentile(vals, 10)),
        "p25": float(np.percentile(vals, 25)),
        "p50": float(np.percentile(vals, 50)),
        "p75": float(np.percentile(vals, 75)),
        "p90": float(np.percentile(vals, 90)),
    }


def _row_ranks(s: jax.Array) -> jax.Array:
    """Per-row rank (number of strictly smaller entries) via double argsort.

    With ties, double-argsort assigns distinct consecutive ranks within a tie
    group (sorted-position semantics) rather than the strict '< count' the
    reference computes; for C99's block-density statistics over real-valued
    cosine matrices ties are measure-zero and the downstream segmentation is
    rank-scale invariant.
    """
    order = jnp.argsort(s, axis=1)
    ranks = jnp.argsort(order, axis=1)
    return ranks.astype(jnp.float32)


@jax.jit
def rank_matrix_global(s: jax.Array) -> jax.Array:
    """C99 global rank matrix: row-rank + column-rank of each entry.

    Equivalent (up to tie handling) to the reference's O(n^3)
    ``row_less + col_less`` (``Semantic_Splitter_Optimized.py:189-192``) but
    O(n^2 log n).
    """
    return _row_ranks(s) + _row_ranks(s.T).T


@functools.partial(jax.jit, static_argnames=("mask_size",))
def rank_matrix_local(s: jax.Array, mask_size: int = 11) -> jax.Array:
    """C99 local rank: fraction of entries in a (mask x mask) window around
    (i, j) strictly smaller than S[i, j], boundary-clipped like the reference
    (``Semantic_Splitter_Optimized.py:171-186``).

    Vectorized as a sum over static (di, dj) shifts; each shift contributes
    an indicator of "window member smaller than center". O(n^2 * mask^2) work
    but fully parallel on the VPU instead of Python loops.
    """
    n = s.shape[0]
    m = max(3, mask_size | 1)
    half = m // 2
    # Pad with +inf so out-of-range neighbors never count as "smaller",
    # and a validity mask to get the clipped window size.
    pad_val = jnp.inf
    sp = jnp.pad(s, half, constant_values=pad_val)
    valid = jnp.pad(jnp.ones_like(s, dtype=jnp.float32), half)
    count = jnp.zeros_like(s)
    denom = jnp.zeros_like(s)
    for di in range(m):
        for dj in range(m):
            win = jax.lax.dynamic_slice(sp, (di, dj), (n, n))
            vld = jax.lax.dynamic_slice(valid, (di, dj), (n, n))
            count = count + jnp.where(win < s, vld, 0.0)
            denom = denom + vld
    return count / jnp.maximum(denom, 1.0)
