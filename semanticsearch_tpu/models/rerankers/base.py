"""Reranker registry + shared pieces.

The seven model families and their hyperparameters mirror the reference's
``MODEL_CONFIGS`` (``MatchZoo_Tool/train_controller.py:46-188``); each model
is a Flax module scoring (left_ids, right_ids) -> (B,) with padding masks
derived from id 0.
"""
from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name.lower()] = cls
        return cls
    return deco


def get_model_class(name: str):
    key = name.lower().replace("-", "_")
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown reranker {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key]


def make_model(name: str, vocab_size: int, embed_dim: int = 100, **kw):
    return get_model_class(name)(vocab_size=vocab_size, embed_dim=embed_dim, **kw)


def pad_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """Mask of non-pad positions (pad id = 0, reference padding_callbacks
    use pad_word_value=0)."""
    return (ids != 0).astype(jnp.float32)


class MLPHead(nn.Module):
    """Small scoring head: hidden layers + 1 output."""

    hidden: tuple = ()
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(1)(x)[..., 0]
