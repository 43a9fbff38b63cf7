"""Pallas flash-attention (forward) for the sentence encoder.

SURVEY.md §2's stated TPU replacement for the transformer forward the
reference gets from sentence-transformers' CUDA kernels
(``Tool/Sentence_Embedding.py:75-150``): a fused attention kernel that
streams KV blocks through VMEM with an online-softmax accumulator, never
materializing the (T, T) attention matrix in HBM. Non-causal, key-padding
mask, no dropout (the encoder trains with dropout 0 by default).

The backward pass recomputes attention with plain XLA (memory is a
non-issue at the encoder's sequence lengths; a
``jax.checkpoint``-style recompute keeps the custom_vjp simple and exactly
consistent with the forward's math).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, block_q: int,
                  block_kv: int, scale: float):
    """Grid (B, H, T/block_q). Streams KV in block_kv chunks with the
    online-softmax (m, l, acc) recurrence."""
    q = q_ref[0, 0].astype(jnp.float32) * scale       # (block_q, Dh)
    t_kv = k_ref.shape[2]
    dh = q_ref.shape[3]
    n_kv = t_kv // block_kv

    # (block_q, 1)-shaped running stats: keep everything 2-D for Mosaic
    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        kmask = m_ref[0, :, pl.ds(i * block_kv, block_kv)]  # (1, block_kv)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_kv)
        s = jnp.where(kmask > 0, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _reference_attention(q, k, v, mask, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Masked non-causal attention: q, k, v (B, H, T, Dh); mask (B, T) with
    1 = real key token. Returns (B, H, T, Dh) in q's dtype.

    T must be a multiple of the block sizes (the encoder's length buckets
    are powers of two >= 64, so this holds by construction; assert guards).
    """
    return _flash_fwd_impl(q, k, v, mask, block_q, block_kv, interpret)


def _flash_fwd_impl(q, k, v, mask, block_q, block_kv, interpret):
    b, h, t, dh = q.shape
    block_q = min(block_q, t)
    block_kv = min(block_kv, t)
    assert t % block_q == 0 and t % block_kv == 0, (
        f"sequence length {t} must divide block sizes {block_q}/{block_kv}"
    )
    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, t // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q,
                          block_kv=block_kv, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, T) so the trailing two block dims are (1, t) == the
            # array dims — TPU lowering requires sublane divisibility or
            # full-dimension blocks
            pl.BlockSpec((1, 1, t), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.float32).reshape(b, 1, t))


def _flash_fwd(q, k, v, mask, block_q, block_kv, interpret):
    out = _flash_fwd_impl(q, k, v, mask, block_q, block_kv, interpret)
    return out, (q, k, v, mask)


def _flash_bwd(block_q, block_kv, interpret, res, g):
    """Backward by XLA recompute of the (small) attention matrix — exact
    gradients, no bespoke backward kernel to maintain."""
    q, k, v, mask = res
    scale = 1.0 / (q.shape[-1] ** 0.5)

    def ref(q_, k_, v_):
        return _reference_attention(q_, k_, v_, mask, scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
