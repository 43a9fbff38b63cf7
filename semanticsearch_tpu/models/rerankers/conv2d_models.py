"""MatchPyramid and ArcII: 2D-convolution match-matrix rerankers.

Hyperparameters from the reference configs: MatchPyramid kernel_count=[16,32]
3x3, dpool_size=[3,10], dropout 0.3 (``train_controller.py:155-174``; the
controller further reduces counts for VRAM — irrelevant on TPU, we keep the
model-default [16,32]); ArcII left_length=16/right_length=256,
kernel_1d_count=32 size 3, kernel_2d_count=[64,64] 3x3 with 3x3 pools,
dropout 0.3 (``:47-75``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.matching import cosine_match_matrix
from .base import pad_mask, register_model


def _adaptive_max_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Static adaptive max pool (B, H, W, C) -> (B, out_h, out_w, C).

    Equivalent of MatchPyramid's dynamic pooling for our fixed input lengths:
    split H/W into out_h/out_w nearly equal bins, max within each.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    # static bin boundaries (shapes are fixed, so this is compile-time)
    hb = [round(i * h / oh) for i in range(oh + 1)]
    wb = [round(j * w / ow) for j in range(ow + 1)]
    rows = []
    for i in range(oh):
        h0, h1 = hb[i], max(hb[i + 1], hb[i] + 1)
        cols = []
        for j in range(ow):
            w0, w1 = wb[j], max(wb[j + 1], wb[j] + 1)
            cols.append(jnp.max(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


@register_model("match_pyramid")
class MatchPyramid(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    kernel_count: Sequence[int] = (16, 32)
    kernel_size: Sequence[Tuple[int, int]] = ((3, 3), (3, 3))
    dpool_size: Tuple[int, int] = (3, 10)
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        mm = cosine_match_matrix(emb(left_ids), emb(right_ids))
        mm = mm * lm[:, :, None] * rm[:, None, :]
        x = mm[..., None]  # (B, L, R, 1)
        for i, (cnt, ks) in enumerate(zip(self.kernel_count, self.kernel_size)):
            x = nn.relu(nn.Conv(cnt, kernel_size=tuple(ks), padding="SAME",
                                name=f"conv_{i}")(x))
        x = _adaptive_max_pool_2d(x, tuple(self.dpool_size))
        x = x.reshape(x.shape[0], -1)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(1, name="out")(x)[..., 0]


@register_model("arcii")
class ArcII(nn.Module):
    # fixed-stride pools + flatten make the head's parameter count a
    # function of the right length — ArcII cannot train with right-length
    # bucketing (train/pairs.py length_buckets)
    length_bucketable = False

    vocab_size: int
    embed_dim: int = 100
    kernel_1d_count: int = 32
    kernel_1d_size: int = 3
    kernel_2d_count: Sequence[int] = (64, 64)
    kernel_2d_size: Sequence[Tuple[int, int]] = ((3, 3), (3, 3))
    pool_2d_size: Sequence[Tuple[int, int]] = ((3, 3), (3, 3))
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        le = nn.Conv(self.kernel_1d_count, kernel_size=(self.kernel_1d_size,),
                     padding="SAME", name="conv1d_left")(emb(left_ids))
        re_ = nn.Conv(self.kernel_1d_count, kernel_size=(self.kernel_1d_size,),
                      padding="SAME", name="conv1d_right")(emb(right_ids))
        # Cross 2D map: x[b, i, j, c] = le[b, i, c] + re[b, j, c]
        x = le[:, :, None, :] + re_[:, None, :, :]
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        x = x * (lm[:, :, None, None] * rm[:, None, :, None])
        for i, (cnt, ks, ps) in enumerate(
            zip(self.kernel_2d_count, self.kernel_2d_size, self.pool_2d_size)
        ):
            x = nn.relu(nn.Conv(cnt, kernel_size=tuple(ks), padding="SAME",
                                name=f"conv2d_{i}")(x))
            x = nn.max_pool(x, window_shape=tuple(ps), strides=tuple(ps))
        x = x.reshape(x.shape[0], -1)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(1, name="out")(x)[..., 0]
