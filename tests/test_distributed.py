"""Distributed helpers: single-process no-op + global mesh construction."""
from semanticsearch_tpu.core.distributed import global_mesh, initialize, is_primary
from semanticsearch_tpu.core.mesh import MeshSpec


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize() is False  # no group to join; everything still works


def test_global_mesh_and_primary():
    mesh = global_mesh(MeshSpec(data=-1, model=1))
    assert mesh.shape["data"] >= 1
    assert is_primary() is True


def test_sharded_topk_twopass_kernel_under_shard_map(mesh8, rng):
    """The multi-chip path routed through the two-pass segment kernel
    (interpret mode on the CPU mesh) must stay exact, padding included."""
    import jax.numpy as jnp
    import numpy as np

    from semanticsearch_tpu.parallel.sharding import pad_to_shards, sharded_topk
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax

    n, d, k = 333, 64, 7
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh8)
    emb = jax.device_put(emb, NamedSharding(mesh8, P("data", None)))
    vals, idx = sharded_topk(
        jnp.asarray(queries), emb, mesh8, k=k, valid_n=valid_n,
        use_pallas=True, impl="twopass", interpret=True,
    )
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for got, want in zip(np.asarray(idx), brute):
        assert set(got.tolist()) == set(want.tolist())


def test_sharded_topk_2level_dcn_merge(rng):
    """Hierarchical (ICI-then-DCN) merge on a 2x4 hybrid mesh must equal
    brute force and the flat single-axis merge, padding included."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semanticsearch_tpu.core.mesh import hybrid_mesh, local_mesh
    from semanticsearch_tpu.parallel.sharding import (
        pad_to_shards,
        shard_corpus,
        sharded_topk,
        sharded_topk_2level,
        swizzle_corpus_sharded,
    )

    mesh2d = hybrid_mesh(2)
    assert mesh2d.shape == {"dcn": 2, "data": 4}
    n, d, k, block_n = 777, 64, 7, 128
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh2d, align=block_n)
    assert emb.shape[0] % (8 * block_n) == 0
    emb = shard_corpus(emb, mesh2d)
    swz = swizzle_corpus_sharded(emb, mesh2d, block_n)
    vals, idx = sharded_topk_2level(
        jnp.asarray(queries), emb, mesh2d, k=k, valid_n=valid_n,
        use_pallas=True, impl="twopass", interpret=True,
        corpus_swizzled_sharded=swz, block_n=block_n, seg_split=2,
    )
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for got, want in zip(np.asarray(idx), brute):
        assert set(got.tolist()) == set(want.tolist())

    # flat merge on a single-axis mesh agrees bit-for-bit
    mesh1d = local_mesh()
    emb1, valid_n1 = pad_to_shards(jnp.asarray(corpus), mesh1d, align=block_n)
    emb1 = shard_corpus(emb1, mesh1d)
    vflat, iflat = sharded_topk(
        jnp.asarray(queries), emb1, mesh1d, k=k, valid_n=valid_n1,
        use_pallas=True, impl="twopass", interpret=True, block_n=block_n,
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(iflat))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vflat),
                               rtol=1e-5, atol=1e-5)


def test_sharded_topk_cached_swizzle(mesh8, rng):
    """The cached per-shard swizzled layout (block-aligned shards) must give
    the same exact results as the on-the-fly path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P
    from semanticsearch_tpu.parallel.sharding import (
        pad_to_shards,
        sharded_topk,
        swizzle_corpus_sharded,
    )

    n, d, k, block_n = 500, 64, 6, 128
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh8, align=block_n)
    assert emb.shape[0] % (8 * block_n) == 0
    emb = jax.device_put(emb, NamedSharding(mesh8, P("data", None)))
    swz = swizzle_corpus_sharded(emb, mesh8, block_n)
    vals, idx = sharded_topk(
        jnp.asarray(queries), emb, mesh8, k=k, valid_n=valid_n,
        use_pallas=True, impl="twopass", interpret=True,
        corpus_swizzled_sharded=swz, block_n=block_n,
    )
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for got, want in zip(np.asarray(idx), brute):
        assert set(got.tolist()) == set(want.tolist())


def test_sharded_swizzle_unaligned_shards_exact(mesh8, rng):
    """Cached per-shard swizzle with shard_rows NOT block_n-aligned: each
    shard pads internally and the local two-pass kernel masks its own pad
    segments, so the merged result stays exact — including global pad rows
    (score 0.0) vs real candidates with NEGATIVE scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semanticsearch_tpu.parallel.sharding import (
        pad_to_shards,
        sharded_topk,
        swizzle_corpus_sharded,
    )

    n, d, k, block_n = 357, 32, 5, 128
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    # one query pointing AWAY from every document: its true top-k is all
    # negative, exactly the regime where 0.0-scoring pad rows would win
    queries = np.concatenate([
        rng.standard_normal((2, d)),
        -corpus.sum(axis=0, keepdims=True),
    ]).astype(np.float32)
    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh8)
    assert emb.shape[0] - valid_n < 8, "pad must stay below the shard count"
    emb = jax.device_put(emb, NamedSharding(mesh8, P("data", None)))
    assert (emb.shape[0] // 8) % block_n != 0  # genuinely unaligned shards
    swz = swizzle_corpus_sharded(emb, mesh8, block_n)
    vals, idx = sharded_topk(
        jnp.asarray(queries), emb, mesh8, k=k, valid_n=valid_n,
        use_pallas=True, impl="twopass", interpret=True,
        corpus_swizzled_sharded=swz, block_n=block_n,
    )
    ref = queries @ corpus.T
    brute = np.argsort(-ref, axis=1)[:, :k]
    for qi, (got, want) in enumerate(zip(np.asarray(idx), brute)):
        assert set(got.tolist()) == set(want.tolist()), (qi, got, want)
    assert (np.asarray(idx) < n).all(), "pad rows must never be returned"
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(ref, axis=1)[:, ::-1][:, :k],
        rtol=1e-5, atol=1e-5)


def test_embedding_index_pad_stays_small(mesh8, rng):
    """EmbeddingIndex.build on a mesh must pad only to the shard count —
    block-aligned padding once pushed sharded_topk's local over-selection
    (k + n_pad) into the tens of thousands at corpus scale."""
    import numpy as np

    from semanticsearch_tpu.index.engine import EmbeddingIndex

    emb = rng.standard_normal((123, 16)).astype(np.float32)
    idx = EmbeddingIndex.build(emb, mesh=mesh8)
    assert idx._corpus.shape[0] - idx.size < 8, (
        idx._corpus.shape, idx.size)
    res = idx.search(emb[:4], k=3)
    assert (res.indices[:, 0] == np.arange(4)).all()
