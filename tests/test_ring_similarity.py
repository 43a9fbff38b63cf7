"""Ring-exchange sharded similarity matrix vs single-device reference."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from semanticsearch_tpu.parallel.ring_similarity import ring_similarity_matrix


def test_ring_similarity_matches_direct(mesh8, rng):
    n, d = 64, 32  # 8 sentences per device
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_sharded = jax.device_put(
        jnp.asarray(emb), NamedSharding(mesh8, P("data", None))
    )
    S = np.asarray(ring_similarity_matrix(emb_sharded, mesh8))
    np.testing.assert_allclose(S, emb @ emb.T, rtol=1e-5, atol=1e-5)
