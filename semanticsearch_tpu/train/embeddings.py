"""Pretrained word-embedding initialization for rerankers.

The reference initializes every reranker's embedding table from GloVe-100
vectors, L2-normalized (``MatchZoo_Tool/train_controller.py:564-581``). This
loader reads any GloVe-format text file (``word v1 v2 ... vD`` per line) from
LOCAL disk (zero-egress environment), fills terms found in the preprocessor
vocabulary, leaves out-of-vocabulary terms at a small random init, and
L2-normalizes rows. Falls back to learned-from-scratch when no file is given.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def load_word_embeddings(
    path: str,
    vocab: Dict[str, int],
    vocab_size: int,
    embed_dim: int,
    seed: int = 42,
    normalize: bool = True,
) -> np.ndarray:
    """Build an (vocab_size, embed_dim) init matrix from a GloVe-format file.

    Rows: pad (id 0) stays zero; vocabulary terms found in the file get their
    vector; everything else gets N(0, 0.1) — then all non-pad rows are
    L2-normalized like the reference's ``_create_embedding_matrix``.
    Returns float32. Raises FileNotFoundError if the file is missing and
    ValueError if no dimension matches.
    """
    rng = np.random.default_rng(seed)
    mat = rng.normal(0.0, 0.1, size=(vocab_size, embed_dim)).astype(np.float32)
    mat[0] = 0.0  # pad

    found = 0
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) != embed_dim + 1:
                continue
            idx = vocab.get(parts[0])
            if idx is None or idx <= 0 or idx >= vocab_size:
                continue
            try:
                mat[idx] = np.asarray(parts[1:], dtype=np.float32)
                found += 1
            except ValueError:
                continue
    if found == 0:
        raise ValueError(
            f"no vocabulary terms matched {path!r} at dim {embed_dim} — "
            "wrong file or wrong embedding_dim?"
        )
    if normalize:
        norms = np.linalg.norm(mat[1:], axis=1, keepdims=True)
        mat[1:] = mat[1:] / np.maximum(norms, 1e-9)
    return mat


def apply_embedding_init(params, matrix: np.ndarray):
    """Replace the model's embedding table (every reranker names it
    'embedding') with the pretrained matrix. Shape-checked."""
    import jax.numpy as jnp

    table = params["embedding"]["embedding"]
    if tuple(table.shape) != tuple(matrix.shape):
        raise ValueError(
            f"embedding init shape {matrix.shape} != model table {table.shape}"
        )
    params = dict(params)
    params["embedding"] = {"embedding": jnp.asarray(matrix)}
    return params


def encoder_token_embeddings(encoder, normalize: bool = True) -> np.ndarray:
    """Reranker embedding init from the TRAINED sentence encoder's token table.

    The reference seeds every reranker's embedding layer with downloaded
    GloVe-100 vectors (``train_controller.py:564-581``) — pretrained
    distributional vectors are what let its rerankers score surface forms
    their own training split never ranked. The zero-egress analog: the
    in-repo contrastively trained encoder's ``token_embed`` table, over the
    SAME subword vocabulary the query pipeline uses. Rows are L2-normalized
    like the reference's matrix; the pad row (id 0) stays zero. Use with
    ``RerankTrainer(embedding_matrix=...)`` and ``embedding_dim`` equal to
    the encoder's hidden size.
    """
    table = np.asarray(encoder.params["token_embed"]["embedding"], np.float32)
    mat = table.copy()
    mat[0] = 0.0
    if normalize:
        norms = np.linalg.norm(mat[1:], axis=1, keepdims=True)
        mat[1:] = mat[1:] / np.maximum(norms, 1e-9)
    return mat
