"""GloVe-format embedding init for rerankers (reference
train_controller.py:564-581: GloVe-100 + L2 normalization)."""
import numpy as np
import pytest

from semanticsearch_tpu.train.embeddings import (
    apply_embedding_init,
    load_word_embeddings,
)


def _write_glove(path, words, dim, rng):
    with open(path, "w") as f:
        for w in words:
            vec = rng.standard_normal(dim)
            f.write(w + " " + " ".join(f"{v:.5f}" for v in vec) + "\n")


def test_loader_fills_normalizes_and_randomizes(tmp_path, rng):
    p = tmp_path / "vectors.txt"
    _write_glove(str(p), ["apple", "banana"], 8, rng)
    vocab = {"<pad>": 0, "<unk>": 1, "apple": 2, "banana": 3, "zzz": 4}
    mat = load_word_embeddings(str(p), vocab, vocab_size=5, embed_dim=8)
    assert mat.shape == (5, 8)
    np.testing.assert_array_equal(mat[0], 0.0)  # pad stays zero
    # all non-pad rows unit-norm (reference L2-normalizes the whole matrix)
    np.testing.assert_allclose(np.linalg.norm(mat[1:], axis=1), 1.0, rtol=1e-5)
    # found rows differ from the random unfound row distribution
    assert not np.allclose(mat[2], mat[4])


def test_loader_errors(tmp_path, rng):
    p = tmp_path / "vectors.txt"
    _write_glove(str(p), ["apple"], 8, rng)
    with pytest.raises(ValueError):  # dim mismatch -> nothing matches
        load_word_embeddings(str(p), {"apple": 1}, vocab_size=2, embed_dim=16)
    with pytest.raises(FileNotFoundError):
        load_word_embeddings(str(tmp_path / "nope.txt"), {"a": 1}, 2, 8)


def test_trainer_uses_embedding_matrix(rng):
    import jax.numpy as jnp

    from semanticsearch_tpu.core.config import TrainConfig
    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.trainer import RerankTrainer

    vocab_size, dim = 32, 16
    mat = rng.standard_normal((vocab_size, dim)).astype(np.float32)
    cfg = TrainConfig(model="knrm", embedding_dim=dim, epochs=1,
                      batch_size=2, optimizer="adam", learning_rate=1e-3)
    tr = RerankTrainer("knrm", vocab_size=vocab_size, cfg=cfg,
                       embedding_matrix=mat)
    ds = PairDataset(
        left=rng.integers(2, vocab_size, size=(8, 4)).astype(np.int32),
        right=rng.integers(2, vocab_size, size=(8, 8)).astype(np.int32),
        labels=np.asarray([1, 0] * 4, np.float32),
        query_ids=np.asarray(["q0"] * 4 + ["q1"] * 4),
    )
    params = tr.init_params(ds)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]["embedding"]), mat, rtol=1e-6
    )
    # shape mismatch is rejected
    with pytest.raises(ValueError):
        RerankTrainer("knrm", vocab_size=vocab_size, cfg=cfg,
                      embedding_matrix=mat[:, :8]).init_params(ds)
