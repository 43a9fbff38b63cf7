"""Ring-exchange sharded similarity matrix vs single-device reference.

These paths can never be validated on real multi-chip hardware in this
environment (SURVEY §2b) — the CPU-mesh suite is their only line of
defense, so it covers device counts, non-divisible sentence counts,
degenerate inputs, and the chunking-pipeline integration, not just one
happy-path shape."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from semanticsearch_tpu.core.mesh import MeshSpec, make_mesh
from semanticsearch_tpu.parallel.ring_similarity import (
    ring_similarity_matrix,
    sharded_doc_similarity,
)


def _unit_rows(rng, n, d=32):
    emb = rng.standard_normal((n, d)).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def test_ring_similarity_matches_direct(mesh8, rng):
    n, d = 64, 32  # 8 sentences per device
    emb = _unit_rows(rng, n, d)
    emb_sharded = jax.device_put(
        jnp.asarray(emb), NamedSharding(mesh8, P("data", None))
    )
    S = np.asarray(ring_similarity_matrix(emb_sharded, mesh8))
    np.testing.assert_allclose(S, emb @ emb.T, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ring_similarity_across_device_counts(n_dev, rng):
    """Parity must hold for every ring size, not just the full mesh —
    odd-step ppermute schedules differ per device count."""
    mesh = make_mesh(MeshSpec(data=n_dev, model=1),
                     devices=jax.devices("cpu")[:n_dev])
    n = n_dev * 6
    emb = _unit_rows(rng, n)
    emb_sharded = jax.device_put(
        jnp.asarray(emb), NamedSharding(mesh, P("data", None)))
    S = np.asarray(ring_similarity_matrix(emb_sharded, mesh))
    np.testing.assert_allclose(S, emb @ emb.T, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [1, 3, 5, 17, 63, 65])
def test_sharded_doc_similarity_nondivisible_counts(mesh8, rng, n):
    """The production entry pads to the device count and crops back:
    every awkward sentence count must round-trip exactly."""
    emb = _unit_rows(rng, n)
    S = sharded_doc_similarity(emb, mesh8)
    assert S.shape == (n, n)
    np.testing.assert_allclose(S, emb @ emb.T, rtol=1e-5, atol=1e-5)


def test_sharded_doc_similarity_degenerate_rows(mesh8):
    """Identical rows and zero rows: padding must not leak into the crop
    (a zero pad row has similarity 0 to everything, same as a zero
    sentence — the crop must still return exactly n rows)."""
    emb = np.ones((10, 16), np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[7] = 0.0  # degenerate zero-embedding sentence
    S = sharded_doc_similarity(emb, mesh8)
    assert S.shape == (10, 10)
    expect = emb @ emb.T
    np.testing.assert_allclose(S, expect, rtol=1e-5, atol=1e-6)
    assert np.all(S[7] == 0.0) and np.all(S[:, 7] == 0.0)


def test_ring_rowblocks_match_per_tile(mesh8, rng):
    """Each (local x block) tile is one einsum of the same operands the
    direct product uses — tile-by-tile agreement at f32, tight tolerance."""
    n_dev = mesh8.shape["data"]
    n_local = 4
    emb = _unit_rows(rng, n_dev * n_local)
    emb_sharded = jax.device_put(
        jnp.asarray(emb), NamedSharding(mesh8, P("data", None)))
    S = np.asarray(ring_similarity_matrix(emb_sharded, mesh8))
    for i in range(n_dev):
        for j in range(n_dev):
            a = emb[i * n_local: (i + 1) * n_local]
            b = emb[j * n_local: (j + 1) * n_local]
            np.testing.assert_allclose(
                S[i * n_local: (i + 1) * n_local,
                  j * n_local: (j + 1) * n_local],
                a @ b.T, rtol=1e-6, atol=1e-6)


def test_pipeline_routes_long_docs_through_ring(mesh8, rng):
    """Grouping on a multi-device mesh with a tiny sp_min_sentences must
    produce the SAME chunks as the single-device path — the SP route is an
    execution detail, never a semantic one."""
    from semanticsearch_tpu.chunking.grouping import chunk_passage_grouping
    from semanticsearch_tpu.core.config import ChunkingConfig

    sizes = [8, 8, 8]
    blocks = []
    for s in sizes:
        c = rng.standard_normal(24)
        c /= np.linalg.norm(c)
        blocks.append(c[None, :] + 0.05 * rng.standard_normal((s, 24)))
    emb = np.concatenate(blocks).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sentences = [f"sentence {i} text." for i in range(emb.shape[0])]
    cfg = ChunkingConfig(method="grouping", engine="spectral")

    S_ring = sharded_doc_similarity(emb, mesh8)
    direct = chunk_passage_grouping("d", sentences, emb, cfg, seed=0)
    via_ring = chunk_passage_grouping("d", sentences, emb, cfg, seed=0,
                                      sim_matrix=S_ring)
    assert [c[1] for c in direct] == [c[1] for c in via_ring]
