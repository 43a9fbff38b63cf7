"""Batched (padded+masked) chunking signals vs per-document computation."""
import jax.numpy as jnp
import numpy as np

from semanticsearch_tpu.core.config import ChunkingConfig
from semanticsearch_tpu.chunking.grouping import batched_similarity_matrices
from semanticsearch_tpu.chunking.splitter import (
    batched_split_signals,
    split_by_embeddings,
)
from semanticsearch_tpu.ops.similarity import (
    adjacent_similarities,
    rank_matrix_global,
    similarity_matrix,
)


def _docs(rng, sizes, d=32):
    out = []
    for n in sizes:
        e = rng.standard_normal((n, d)).astype(np.float32)
        out.append(e / np.linalg.norm(e, axis=1, keepdims=True))
    return out


def test_batched_rank_matrix_matches_per_doc(rng):
    docs = _docs(rng, [5, 12, 9, 16])
    batched = batched_split_signals(docs, bucket=16)
    for emb, (R_b, adj_b) in zip(docs, batched):
        S = similarity_matrix(jnp.asarray(emb))
        R = np.asarray(rank_matrix_global(S))
        adj = np.asarray(adjacent_similarities(jnp.asarray(emb)))
        np.testing.assert_array_equal(R_b, R)
        np.testing.assert_allclose(adj_b, adj, rtol=1e-5, atol=1e-6)


def test_batched_sims_match_per_doc(rng):
    docs = _docs(rng, [4, 11, 7])
    for emb, S_b in zip(docs, batched_similarity_matrices(docs, bucket=16)):
        S = np.asarray(similarity_matrix(jnp.asarray(emb)))
        np.testing.assert_allclose(S_b, S, rtol=1e-5, atol=1e-6)


def test_split_with_precomputed_signals_identical(rng):
    emb = _docs(rng, [24])[0]
    cfg = ChunkingConfig()
    (sig,) = batched_split_signals([emb], bucket=32)
    g1 = split_by_embeddings(emb, cfg)
    g2 = split_by_embeddings(emb, cfg, signals=sig)
    assert g1 == g2
