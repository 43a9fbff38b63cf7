"""Pallas flash-attention parity vs reference softmax attention, and the
encoder wired with attention='flash' (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsearch_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
)


@pytest.mark.parametrize("b,h,t,dh,block", [
    (2, 4, 128, 32, 128),   # single kv block
    (2, 2, 256, 32, 128),   # streamed kv blocks (online softmax recurrence)
    (1, 2, 64, 16, 128),    # t < block -> clamped
])
def test_flash_matches_reference(rng, b, h, t, dh, block):
    q = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, t - t // 4:] = 0.0  # padded tail keys
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        block, block, True,
    )
    want = _reference_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        1.0 / dh ** 0.5,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_reference(rng):
    b, h, t, dh = 1, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    mask = jnp.ones((b, t), jnp.float32)

    def loss_flash(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, mask, 128, 128, True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(
            _reference_attention(q_, k_, v_, mask, 1.0 / dh ** 0.5) ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_flash_matches_stock(rng):
    """Same params, flash vs stock attention: embeddings must agree (the
    attention_fn hook swaps only the math, not the parameter tree)."""
    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    texts = ["the quick brown fox", "jumps over a lazy dog today",
             "completely different sentence about markets"]
    cfg_stock = EncoderConfig(vocab_size=512, hidden_dim=64, num_layers=2,
                              num_heads=4, mlp_dim=128, max_len=64,
                              dtype="float32", attention="stock")
    cfg_flash = EncoderConfig(**{**cfg_stock.__dict__, "attention": "flash"})
    enc_stock = SentenceEncoder(cfg_stock, seed=7)
    enc_flash = SentenceEncoder(cfg_flash, seed=7, params=enc_stock.params)
    np.testing.assert_allclose(
        enc_flash.encode(texts), enc_stock.encode(texts),
        rtol=2e-4, atol=2e-4,
    )
