"""Match-matrix and kernel-pooling ops shared by the rerankers.

These are the compute cores of the MatchZoo model family the reference trains
(``MatchZoo_Tool/train_controller.py:46-188``). Conventions follow
MatchZoo-py: KNRM's Gaussian kernel bank places mu at
``1/(K-1) + 2i/(K-1) - 1`` with the last kernel clamped to the exact-match
kernel (mu=1, exact_sigma); pooling is ``sum_left log1p(sum_right exp(...))``.
Unlike MatchZoo, padding positions are masked out of every pooling sum —
required for correctness with static-shape padded batches on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def kernel_mus_sigmas(
    kernel_num: int, sigma: float, exact_sigma: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MatchZoo KNRM kernel bank: evenly spaced mus + an exact-match kernel."""
    i = jnp.arange(kernel_num, dtype=jnp.float32)
    mus = 1.0 / (kernel_num - 1) + (2.0 * i) / (kernel_num - 1) - 1.0
    exact = mus > 1.0
    mus = jnp.where(exact, 1.0, mus)
    sigmas = jnp.where(exact, exact_sigma, sigma)
    return mus, sigmas


def cosine_match_matrix(
    left_emb: jnp.ndarray, right_emb: jnp.ndarray
) -> jnp.ndarray:
    """(B, L, D) x (B, R, D) -> (B, L, R) cosine match matrix.

    Normalization via rsqrt of the CLAMPED squared norm, not
    ``x / max(||x||, eps)``: the gradient of ``linalg.norm`` at an
    exactly-zero row is NaN, and ``maximum`` does not block it (the chain
    multiplies 0 * NaN). Exactly-zero embedding rows are real inputs here —
    the pad row of an encoder-transferred embedding table
    (train/embeddings.py::encoder_token_embeddings) is zeroed by design,
    and one NaN row poisons every parameter after the first update. With
    the clamp on the SQUARED norm, the inactive branch contributes
    d(max)/d(sq) = 0 against a finite rsqrt — gradients stay finite.
    """
    def unit(x):
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-18))

    return jnp.einsum("bld,brd->blr", unit(left_emb), unit(right_emb),
                      preferred_element_type=jnp.float32)


def kernel_pooling(
    mm: jnp.ndarray,
    left_mask: jnp.ndarray,
    right_mask: jnp.ndarray,
    mus: jnp.ndarray,
    sigmas: jnp.ndarray,
) -> jnp.ndarray:
    """RBF soft-TF pooling: (B, L, R) match matrix -> (B, K) features.

    phi_k = sum_i mask_i * log1p( sum_j mask_j * exp(-(M_ij-mu_k)^2 / 2s_k^2) )
    """
    pair_mask = (
        left_mask[:, :, None].astype(jnp.float32)
        * right_mask[:, None, :].astype(jnp.float32)
    )
    # (B, L, R, K)
    diff = mm[..., None] - mus[None, None, None, :]
    k = jnp.exp(-0.5 * (diff * diff) / (sigmas[None, None, None, :] ** 2))
    k = k * pair_mask[..., None]
    kde = jnp.log1p(jnp.sum(k, axis=2))  # (B, L, K)
    kde = kde * left_mask[:, :, None].astype(jnp.float32)
    return jnp.sum(kde, axis=1)  # (B, K)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_flat(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k of the flattened trailing dims: (B, ...) -> (B, k).

    Used by MVLSTM's top-k interaction pooling (MatchZoo MVLSTM default
    top_k=10).
    """
    flat = values.reshape(values.shape[0], -1)
    vals, _ = jax.lax.top_k(flat, k)
    return vals
