"""Recurrent rerankers: ESIM, MatchLSTM, MVLSTM.

TPU note: LSTMs run as ``lax.scan`` over time via Flax's RNN wrapper —
the standard TPU answer to the reference's cuDNN LSTMs (SURVEY.md §7 "hard
parts"). All attention/pooling honors padding masks.

Hyperparameters from the reference configs (``train_controller.py:122-187``):
ESIM mask_value=0, dropout 0.2, hidden 200, 1 LSTM layer, RankCrossEntropy;
MatchLSTM mask_value=0; MVLSTM defaults (hidden 128, top_k=10, mlp 128).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.matching import topk_flat
from .base import pad_mask, register_model

NEG_BIG = -1e9


def _bilstm(hidden: int, name: str):
    return nn.Bidirectional(
        nn.RNN(nn.OptimizedLSTMCell(hidden)),
        nn.RNN(nn.OptimizedLSTMCell(hidden)),
        name=name,
    )


def _masked_softmax(logits, mask, axis):
    logits = jnp.where(mask.astype(bool), logits, NEG_BIG)
    return nn.softmax(logits, axis=axis)


def _masked_max(x, mask):
    return jnp.max(jnp.where(mask[..., None].astype(bool), x, NEG_BIG), axis=1)


def _masked_mean(x, mask):
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


@register_model("esim")
class ESIM(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    hidden_size: int = 200
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        le, re_ = emb(left_ids), emb(right_ids)
        if self.dropout_rate > 0:
            drop = nn.Dropout(self.dropout_rate, deterministic=deterministic)
            le, re_ = drop(le), drop(re_)

        enc = _bilstm(self.hidden_size, "encode")
        a = enc(le)   # (B, L, 2H)
        b = enc(re_)  # (B, R, 2H)

        # Cross attention with both-side masking.
        e = jnp.einsum("bld,brd->blr", a, b)
        att_ab = _masked_softmax(e, rm[:, None, :], axis=2)   # for each l over r
        att_ba = _masked_softmax(e, lm[:, :, None], axis=1)   # for each r over l
        a_align = jnp.einsum("blr,brd->bld", att_ab, b)
        b_align = jnp.einsum("blr,bld->brd", att_ba, a)

        def enhance(x, y):
            return jnp.concatenate([x, y, x - y, x * y], axis=-1)

        proj = nn.Dense(self.hidden_size, name="projection")
        a_m = nn.relu(proj(enhance(a, a_align)))
        b_m = nn.relu(proj(enhance(b, b_align)))

        comp = _bilstm(self.hidden_size, "compose")
        a_c = comp(a_m)
        b_c = comp(b_m)

        v = jnp.concatenate(
            [
                _masked_max(a_c, lm), _masked_mean(a_c, lm),
                _masked_max(b_c, rm), _masked_mean(b_c, rm),
            ],
            axis=-1,
        )
        v = nn.relu(nn.Dense(self.hidden_size, name="mlp")(v))
        if self.dropout_rate > 0:
            v = nn.Dropout(self.dropout_rate, deterministic=deterministic)(v)
        return nn.Dense(1, name="out")(v)[..., 0]


@register_model("match_lstm")
class MatchLSTM(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    hidden_size: int = 100
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        enc = _bilstm(self.hidden_size, "encode")
        a = enc(emb(left_ids))   # query (B, L, 2H)
        b = enc(emb(right_ids))  # doc   (B, R, 2H)

        # Each doc position attends over the query; match-LSTM composes the
        # [doc; attended-query; diff; prod] sequence.
        e = jnp.einsum("brd,bld->brl", b, a)
        att = _masked_softmax(e, lm[:, None, :], axis=2)
        b_align = jnp.einsum("brl,bld->brd", att, a)
        m = jnp.concatenate([b, b_align, b - b_align, b * b_align], axis=-1)
        m = nn.relu(nn.Dense(self.hidden_size, name="projection")(m))
        comp = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="compose")
        h = comp(m)
        v = _masked_max(h, rm)
        if self.dropout_rate > 0:
            v = nn.Dropout(self.dropout_rate, deterministic=deterministic)(v)
        return nn.Dense(1, name="out")(v)[..., 0]


@register_model("mvlstm")
class MVLSTM(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    hidden_size: int = 128
    top_k: int = 10
    mlp_hidden: int = 128
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        enc = _bilstm(self.hidden_size, "encode")
        a = enc(emb(left_ids))
        b = enc(emb(right_ids))
        inter = jnp.einsum("bld,brd->blr", a, b)
        inter = jnp.where(
            (lm[:, :, None] * rm[:, None, :]).astype(bool), inter, NEG_BIG
        )
        v = topk_flat(inter, self.top_k)
        v = nn.relu(nn.Dense(self.mlp_hidden, name="mlp")(v))
        if self.dropout_rate > 0:
            v = nn.Dropout(self.dropout_rate, deterministic=deterministic)(v)
        return nn.Dense(1, name="out")(v)[..., 0]
