"""Worker for the two-process distributed test (spawned by
tests/test_multiprocess.py). Joins the process group via
core.distributed.initialize, builds the global mesh, and runs the
corpus-sharded exact top-k collective across processes.

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

    rng = np.random.default_rng(0)  # same data in every process
    corpus = rng.standard_normal((101, 32)).astype(np.float32)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    k = 5

    emb, valid_n = pad_to_shards(jnp.asarray(corpus), mesh)
    # cross-process placement: computation-follows-sharding (device_put of a
    # host array onto non-addressable devices is not allowed)
    emb = jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, P("data", None))
    )(emb)
    vals, idx = sharded_topk(
        jnp.asarray(queries), emb, mesh, k=k, valid_n=valid_n
    )
    got = np.asarray(jax.device_get(idx))
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    assert (got == brute).all(), (got, brute)
    print(f"DIST_OK proc={pid} devices={n_dev}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
