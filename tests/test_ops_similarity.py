import jax.numpy as jnp
import numpy as np

from semanticsearch_tpu.ops.similarity import (
    adjacent_similarities,
    l2_normalize,
    rank_matrix_global,
    rank_matrix_local,
    similarity_matrix,
    similarity_matrix_pallas,
)


def _np_rank_local(S, mask_size):
    """Direct port of the reference's local-rank loop semantics for testing."""
    n = S.shape[0]
    m = max(3, mask_size | 1)
    half = m // 2
    R = np.zeros_like(S)
    for i in range(n):
        i0, i1 = max(0, i - half), min(n, i + half + 1)
        for j in range(n):
            j0, j1 = max(0, j - half), min(n, j + half + 1)
            win = S[i0:i1, j0:j1]
            R[i, j] = (win < S[i, j]).sum() / win.size
    return R


def test_l2_normalize_unit_norm(rng):
    x = rng.standard_normal((10, 32)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_similarity_matrix_matches_numpy(rng):
    x = rng.standard_normal((17, 64)).astype(np.float32)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    S = np.asarray(similarity_matrix(jnp.asarray(x)))
    np.testing.assert_allclose(S, x @ x.T, rtol=1e-5, atol=1e-5)


def test_similarity_matrix_pallas_interpret(rng):
    x = rng.standard_normal((70, 128)).astype(np.float32)
    S = np.asarray(similarity_matrix_pallas(jnp.asarray(x), block=32, interpret=True))
    np.testing.assert_allclose(S, x @ x.T, rtol=1e-4, atol=1e-4)


def test_adjacent_similarities(rng):
    x = rng.standard_normal((9, 16)).astype(np.float32)
    got = np.asarray(adjacent_similarities(jnp.asarray(x)))
    want = np.sum(x[:-1] * x[1:], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rank_matrix_global_distinct_values(rng):
    # With all-distinct entries, double-argsort rank == strict '<' count,
    # matching the reference's row_less + col_less exactly.
    S = rng.permutation(25.0 * np.arange(25)).reshape(5, 5).astype(np.float32)
    R = np.asarray(rank_matrix_global(jnp.asarray(S)))
    row_less = (S[:, None, :] < S[:, :, None]).sum(axis=2)
    col_less = (S.T[:, None, :] < S.T[:, :, None]).sum(axis=2).T
    np.testing.assert_array_equal(R, (row_less + col_less).astype(np.float32))


def test_rank_matrix_local_matches_reference_loop(rng):
    S = rng.standard_normal((12, 12)).astype(np.float32)
    S = 0.5 * (S + S.T)
    R = np.asarray(rank_matrix_local(jnp.asarray(S), mask_size=5))
    want = _np_rank_local(S, 5)
    np.testing.assert_allclose(R, want, rtol=1e-5, atol=1e-6)
