"""Worker for the two-process distributed tests (spawned by
tests/test_multiprocess.py). Joins the process group via
core.distributed.initialize, builds the global mesh, and runs every
cross-process collective leg the single-host suite cannot exercise:
corpus-sharded top-k, a skewed shard layout, the 2-level DCN merge, the
ring-exchange similarity matrix, and raw psum/all_gather sanity.

Each leg prints ``LEG_OK <name> proc=<pid>``; the parent test asserts the
markers per leg, so one process-pair spawn backs several test functions.

Run: python tests/_dist_worker.py <process_id> <coordinator_port>
"""
import os
import sys


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    pid = int(sys.argv[1])
    port = sys.argv[2]
    # Pin CPU before any backend initializes (the axon TPU plugin rewrites
    # platform selection at import — config.update after import is required).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from semanticsearch_tpu.core import distributed
    from semanticsearch_tpu.core.mesh import MeshSpec

    assert distributed.initialize(f"127.0.0.1:{port}", 2, pid) is True
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semanticsearch_tpu.parallel.sharding import pad_to_shards, sharded_topk

    mesh = distributed.global_mesh(MeshSpec(data=-1, model=1))
    n_dev = mesh.shape["data"]

    def place(arr):
        """Cross-process placement: computation-follows-sharding (device_put
        of a host array onto non-addressable devices is not allowed)."""
        return jax.jit(
            lambda a: a, out_shardings=NamedSharding(mesh, P("data", None))
        )(arr)

    def replicate(arr):
        return jax.jit(
            lambda a: a, out_shardings=NamedSharding(mesh, P())
        )(arr)

    # ---- leg 1: corpus-sharded exact top-k, uneven row count ----
    rng = np.random.default_rng(0)  # same data in every process
    corpus = rng.standard_normal((101, 32)).astype(np.float32)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    k = 5
    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh)
    emb = place(emb)
    vals, idx = sharded_topk(
        jnp.asarray(queries), emb, mesh, k=k, valid_n=valid_n
    )
    got = np.asarray(jax.device_get(idx))
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    assert (got == brute).all(), (got, brute)
    print(f"LEG_OK topk proc={pid} devices={n_dev}", flush=True)

    # ---- leg 2: skewed layout — every top-k row lives on ONE shard, so a
    # correct answer REQUIRES the cross-process merge to carry one shard's
    # full candidate list over the other's ----
    skew = rng.standard_normal((64, 32)).astype(np.float32) * 0.01
    winners = rng.standard_normal((5, 32)).astype(np.float32) * 10.0
    skew[:5] = winners  # all winners in shard 0's rows
    semb, svalid = pad_to_shards(jnp.asarray(skew), mesh)
    svals, sidx = sharded_topk(
        jnp.asarray(queries), place(semb), mesh, k=5, valid_n=svalid
    )
    sgot = np.asarray(jax.device_get(sidx))
    sbrute = np.argsort(-(queries @ skew.T), axis=1)[:, :5]
    assert (sgot == sbrute).all(), (sgot, sbrute)
    print(f"LEG_OK skewed proc={pid}", flush=True)

    # ---- leg 3: hierarchical 2-level merge on a ("dcn","data") mesh ----
    from semanticsearch_tpu.core.mesh import hybrid_mesh
    from semanticsearch_tpu.parallel.sharding import (
        shard_corpus, sharded_topk_2level,
    )

    mesh2d = hybrid_mesh(2)
    corpus2 = rng.standard_normal((96, 32)).astype(np.float32)
    c2 = jax.jit(
        lambda a: a,
        out_shardings=NamedSharding(mesh2d, P(("dcn", "data"), None)),
    )(jnp.asarray(corpus2))
    v2, i2 = sharded_topk_2level(jnp.asarray(queries), c2, mesh2d, k=5)
    got2 = np.asarray(jax.device_get(i2))
    brute2 = np.argsort(-(queries @ corpus2.T), axis=1)[:, :5]
    assert (got2 == brute2).all(), (got2, brute2)
    print(f"LEG_OK twolevel proc={pid}", flush=True)

    # ---- leg 4: ring-exchange similarity matrix across the process
    # boundary (ppermute rides the inter-process transport) ----
    from semanticsearch_tpu.parallel.ring_similarity import (
        ring_similarity_matrix,
    )

    semb2 = rng.standard_normal((16, 24)).astype(np.float32)
    semb2 /= np.linalg.norm(semb2, axis=1, keepdims=True)
    S = ring_similarity_matrix(place(jnp.asarray(semb2)), mesh)
    S_host = np.asarray(jax.device_get(replicate(S)))
    np.testing.assert_allclose(S_host, semb2 @ semb2.T, rtol=1e-5,
                               atol=1e-5)
    print(f"LEG_OK ring proc={pid}", flush=True)

    # ---- leg 5: raw collectives sanity (psum + all_gather) ----
    from jax import shard_map

    x = np.arange(2 * 8, dtype=np.float32).reshape(2, 8)
    xs = place(jnp.asarray(x))

    def body(xl):
        total = jax.lax.psum(jnp.sum(xl), "data")
        gathered = jax.lax.all_gather(xl, "data", tiled=True)
        return total + 0 * jnp.sum(gathered), gathered

    total, gathered = shard_map(
        body, mesh=mesh, in_specs=P("data", None),
        out_specs=(P(), P()), check_vma=False,
    )(xs)
    assert float(jax.device_get(replicate(total))) == float(x.sum())
    g_host = np.asarray(jax.device_get(replicate(gathered)))
    np.testing.assert_array_equal(g_host, x)
    print(f"LEG_OK collectives proc={pid}", flush=True)

    print(f"DIST_OK proc={pid} devices={n_dev}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
