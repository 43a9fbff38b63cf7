"""Ring-exchange similarity matrix for sentence axes larger than one device.

SURVEY.md §2b (sequence/context parallelism): the reference computes O(n^2)
similarity matrices whole on one device (``Method/semantic_common.py:144-191``)
and simply caps document length. Here, for documents beyond one device's
memory, the sentence axis is sharded over the mesh ``data`` axis and the
similarity matrix is computed in tiles with a ring exchange of remote
embedding blocks (`jax.lax.ppermute`) — the workload's analog of ring
attention: at step s every device holds the block of device (i - s) mod P,
computes one (n_local x n_local) tile against its own rows, and passes the
block to its right neighbor. Communication rides ICI; every device ends with
its row-block of the full matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, static_argnames=("mesh",))
def ring_similarity_matrix(emb_sharded: jax.Array, mesh: Mesh) -> jax.Array:
    """(N, D) embeddings row-sharded over 'data' -> (N, N) row-sharded matrix.

    N must be divisible by the data-axis size. Embeddings should be
    L2-normalized (dot == cosine).
    """
    n_total = emb_sharded.shape[0]
    n_dev = mesh.shape["data"]
    n_local = n_total // n_dev

    def local(emb_local):
        my = jax.lax.axis_index("data")
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        out = jnp.zeros((n_local, n_total), jnp.float32)

        def step(s, carry):
            block, out = carry
            src = jax.lax.rem(my - s + n_dev, n_dev)
            tile = jnp.einsum(
                "id,jd->ij", emb_local, block,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out = jax.lax.dynamic_update_slice(out, tile, (0, src * n_local))
            block = jax.lax.ppermute(block, "data", perm)
            return (block, out)

        _, out = jax.lax.fori_loop(
            0, n_dev, step, (emb_local, out)
        )
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=P("data", None),
        check_vma=False,
    )(emb_sharded)


def sharded_doc_similarity(embeddings, mesh: Mesh):
    """Production entry: one long document's (n, n) similarity matrix via the
    ring exchange, handling padding to the device count.

    Used by the chunking pipeline for documents with >= sp_min_sentences
    sentences on a multi-device mesh (the reference computes these whole on
    one device and truncates instead — ``semantic_common.py:144-191``).
    Returns a host numpy (n, n) float32 matrix (the grouping post-processing
    consumes it host-side).
    """
    import numpy as np

    emb = jnp.asarray(np.asarray(embeddings, np.float32))
    n = emb.shape[0]
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
    emb = jax.device_put(emb, NamedSharding(mesh, P("data", None)))
    S = ring_similarity_matrix(emb, mesh)
    return np.asarray(S)[:n, :n]
