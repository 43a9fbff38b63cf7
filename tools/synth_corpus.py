"""Shared synthetic-corpus hash for the TPU benches.

One definition of the murmur-style row hash, with bit-identical device (jnp)
and host (numpy) variants — bench_10m's recall check depends on the device
corpus and the host brute-force replica staying in lockstep. (jax.random at
corpus scale compiles pathologically through remote links; an integer hash
of iota gives uniform pseudo-random unit rows, which is all a top-k bench
needs.)
"""
from __future__ import annotations

import numpy as np

_M1, _M2, _M3, _MIX = 2654435761, 40503, 977, 0x5BD1E995


def device_unit_rows(row_ids, d: int, dtype=None):
    """(len(row_ids), d) L2-normalized rows on device from int32/uint32 row
    ids (a (N, d)-broadcast uint32 array or (N, 1) column)."""
    import jax
    import jax.numpy as jnp

    r = jnp.asarray(row_ids, jnp.uint32)
    if r.ndim == 1:
        r = r[:, None]
    r = jnp.broadcast_to(r, (r.shape[0], d))
    j = jax.lax.broadcasted_iota(jnp.uint32, (r.shape[0], d), 1)
    h = r * jnp.uint32(_M1) + j * jnp.uint32(_M2) + jnp.uint32(_M3)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(_MIX)
    h = h ^ (h >> 15)
    x = h.astype(jnp.float32) / jnp.float32(2**32) - 0.5
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    x = x / norm
    return x.astype(dtype) if dtype is not None else x


def host_unit_rows(row_ids: np.ndarray, d: int,
                   bf16_round: bool = True) -> np.ndarray:
    """Host replica of :func:`device_unit_rows` (f32; optionally rounded
    through bf16 exactly as a bf16 device corpus stores it)."""
    i = np.asarray(row_ids, np.uint32)[:, None]
    j = np.arange(d, dtype=np.uint32)[None, :]
    h = i * np.uint32(_M1) + j * np.uint32(_M2) + np.uint32(_M3)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(_MIX)
    h = h ^ (h >> np.uint32(15))
    x = h.astype(np.float32) / np.float32(2**32) - 0.5
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    if bf16_round:
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    return x
