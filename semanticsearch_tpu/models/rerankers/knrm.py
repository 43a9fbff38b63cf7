"""KNRM and Conv-KNRM kernel-pooling rerankers.

Hyperparameters from the reference configs: KNRM kernel_num=21, sigma=0.1,
exact_sigma=0.001 (``train_controller.py:76-95``); Conv-KNRM filters=128,
tanh conv activation, max_ngram=3, crossmatch=True, kernel_num=11
(``:96-121``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.matching import cosine_match_matrix, kernel_mus_sigmas, kernel_pooling
from .base import pad_mask, register_model


@register_model("knrm")
class KNRM(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    kernel_num: int = 21
    sigma: float = 0.1
    exact_sigma: float = 0.001

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        mm = cosine_match_matrix(emb(left_ids), emb(right_ids))
        mus, sigmas = kernel_mus_sigmas(self.kernel_num, self.sigma, self.exact_sigma)
        phi = kernel_pooling(mm, lm, rm, mus, sigmas)
        return nn.Dense(1, name="out")(phi)[..., 0]


class _NGramConv(nn.Module):
    """1D convs producing one representation per n-gram size (tanh, SAME)."""

    filters: int
    max_ngram: int

    @nn.compact
    def __call__(self, x):
        reps = []
        for n in range(1, self.max_ngram + 1):
            h = nn.Conv(self.filters, kernel_size=(n,), padding="SAME",
                        name=f"conv_{n}")(x)
            reps.append(nn.tanh(h))
        return reps


@register_model("conv_knrm")
class ConvKNRM(nn.Module):
    vocab_size: int
    embed_dim: int = 100
    filters: int = 128
    max_ngram: int = 3
    use_crossmatch: bool = True
    kernel_num: int = 11
    sigma: float = 0.1
    exact_sigma: float = 0.001

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        convs = _NGramConv(self.filters, self.max_ngram, name="ngrams")
        l_reps = convs(emb(left_ids))
        r_reps = convs(emb(right_ids))
        mus, sigmas = kernel_mus_sigmas(self.kernel_num, self.sigma, self.exact_sigma)
        feats = []
        for i, lr in enumerate(l_reps):
            for j, rr in enumerate(r_reps):
                if not self.use_crossmatch and i != j:
                    continue
                mm = cosine_match_matrix(lr, rr)
                feats.append(kernel_pooling(mm, lm, rm, mus, sigmas))
        phi = jnp.concatenate(feats, axis=1)
        return nn.Dense(1, name="out")(phi)[..., 0]
