"""Property tests for the rerankers: mask isolation and score determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsearch_tpu.models.rerankers import make_model

MODELS = {
    "knrm": {},
    "conv_knrm": {"filters": 8},
    "match_pyramid": {},
    "arcii": {"kernel_2d_count": (8, 8), "pool_2d_size": ((2, 2), (2, 2))},
    "esim": {"hidden_size": 8},
    "match_lstm": {"hidden_size": 8},
    "mvlstm": {"hidden_size": 8, "top_k": 4},
}


def _score(model, params, left, right):
    return np.asarray(
        model.apply({"params": params}, jnp.asarray(left), jnp.asarray(right))
    )


@pytest.mark.parametrize("name", sorted(MODELS))
def test_padding_isolation(name):
    """Extending right-side padding must not change scores (mask honored)."""
    rng = np.random.default_rng(0)
    model = make_model(name, vocab_size=64, embed_dim=8, **MODELS[name])
    left = rng.integers(2, 64, size=(3, 4)).astype(np.int32)
    right = np.zeros((3, 16), np.int32)
    right[:, :6] = rng.integers(2, 64, size=(3, 6))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                        jnp.asarray(right))["params"]
    s1 = _score(model, params, left, right)

    # different batch companion rows, same row 0 -> same score for row 0
    right2 = right.copy()
    right2[1:] = rng.integers(2, 64, size=(2, 16))
    right2[1:, 10:] = 0
    s2 = _score(model, params, left, right2)
    np.testing.assert_allclose(s1[0], s2[0], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_deterministic_eval(name):
    """deterministic=True scoring is reproducible (dropout off)."""
    rng = np.random.default_rng(1)
    model = make_model(name, vocab_size=64, embed_dim=8, **MODELS[name])
    left = rng.integers(2, 64, size=(2, 4)).astype(np.int32)
    right = rng.integers(2, 64, size=(2, 12)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                        jnp.asarray(right))["params"]
    s1 = _score(model, params, left, right)
    s2 = _score(model, params, left, right)
    np.testing.assert_array_equal(s1, s2)
    assert s1.shape == (2,)
