"""MLM pretraining (train/mlm_pretrain.py): the zero-egress analog of the
reference's hub-pretrained encoder weights (Tool/Sentence_Embedding.py:
75-150). Contracts: the tied decoder leaves the parameter tree identical
(checkpoints stay portable), the loss learns on a structured corpus, and
pretraining composes with (and measurably helps) the contrastive stage.
"""
import jax
import numpy as np
import pytest

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.models.encoder import SentenceEncoder
from semanticsearch_tpu.train.encoder_train import (
    ContrastiveConfig,
    ContrastiveEncoderTrainer,
    load_encoder,
    save_encoder,
)
from semanticsearch_tpu.train.mlm_pretrain import MLMConfig, MLMPretrainer


def _tiny_encoder(seed=0, vocab=512):
    cfg = EncoderConfig(vocab_size=vocab, hidden_dim=32, num_layers=1,
                        num_heads=2, mlp_dim=64, max_len=32, dtype="float32")
    return SentenceEncoder(cfg, seed=seed)


def _corpus(n=96, seed=0):
    """Highly structured texts: topic words co-occur, so a denoiser that
    learns co-occurrence beats the uniform-guess floor by a wide margin."""
    rng = np.random.default_rng(seed)
    topics = [[f"t{t}word{j}" for j in range(6)] for t in range(4)]
    return [" ".join(rng.choice(topics[i % 4], size=8)) for i in range(n)]


def test_return_tokens_shape_and_pooled_path_unchanged():
    enc = _tiny_encoder()
    ids, mask = enc.tokenizer.encode_batch(["alpha beta gamma"], max_len=16)
    tokens = enc.model.apply({"params": enc.params}, ids, mask,
                             return_tokens=True)
    assert tokens.shape == (1, 16, enc.cfg.hidden_dim)
    pooled = enc.model.apply({"params": enc.params}, ids, mask)
    assert pooled.shape == (1, enc.cfg.hidden_dim)
    np.testing.assert_allclose(np.linalg.norm(pooled, axis=-1), 1.0,
                               rtol=1e-5)


def test_mlm_learns_and_keeps_param_tree():
    enc = _tiny_encoder()
    tree_before = jax.tree.structure(enc.params)
    shapes_before = jax.tree.map(lambda x: x.shape, enc.params)
    hist = MLMPretrainer(
        enc, MLMConfig(epochs=40, batch_size=32, learning_rate=3e-3,
                       max_len=16, seed=0),
    ).fit(_corpus())
    losses = [h["loss"] for h in hist]
    assert all(np.isfinite(losses))
    # start is the uniform floor ln(512) ~= 6.24; learning co-occurrence
    # must cut it far below the unigram-marginal floor ln(24) ~= 3.2
    assert losses[-1] < losses[0] * 0.5, f"mlm loss barely moved: {losses}"
    # tied decoder: NO new parameters — the tree is the encoder's own
    assert jax.tree.structure(enc.params) == tree_before
    assert jax.tree.map(lambda x: x.shape, enc.params) == shapes_before


def test_mlm_checkpoint_roundtrip(tmp_path):
    enc = _tiny_encoder()
    MLMPretrainer(enc, MLMConfig(epochs=1, max_len=16)).fit(_corpus(32))
    path = str(tmp_path / "ckpt")
    save_encoder(enc, path)
    enc2 = load_encoder(path)
    np.testing.assert_allclose(enc2.encode(["t0word0 t0word1"]),
                               enc.encode(["t0word0 t0word1"]),
                               rtol=1e-5, atol=1e-6)


def test_mlm_then_contrastive_composes():
    """Pretraining must not break the contrastive stage; both losses move."""
    enc = _tiny_encoder()
    MLMPretrainer(enc, MLMConfig(epochs=2, batch_size=32, max_len=16,
                                 seed=0)).fit(_corpus())
    rng = np.random.default_rng(0)
    topics = [[f"t{t}word{j}" for j in range(6)] for t in range(4)]
    qv = [[f"q{t}term{j}" for j in range(3)] for t in range(4)]
    pairs = []
    for t in range(4):
        for _ in range(12):
            pairs.append((" ".join(rng.choice(qv[t], size=2)),
                          " ".join(rng.choice(topics[t], size=6))))
    hist = ContrastiveEncoderTrainer(
        enc, ContrastiveConfig(epochs=4, batch_size=24, learning_rate=1e-3,
                               max_len_query=8, max_len_chunk=16, seed=0),
    ).fit(pairs)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["loss"])


def test_mlm_rejects_empty():
    enc = _tiny_encoder()
    with pytest.raises(ValueError):
        MLMPretrainer(enc).fit([])
    with pytest.raises(ValueError):
        MLMPretrainer(enc).fit(["", ""])
