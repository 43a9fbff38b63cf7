"""Contrastive encoder training: the encoder must LEARN semantics — mapping
disjoint query/document vocabularies of the same topic together — not just
hash lexical overlap. This is the in-repo replacement for the reference's
pretrained sentence-transformers weights (Tool/Sentence_Embedding.py:75-150).
"""
import numpy as np
import pytest

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.models.encoder import SentenceEncoder
from semanticsearch_tpu.train.encoder_train import (
    ContrastiveConfig,
    ContrastiveEncoderTrainer,
    load_encoder,
    pairs_from_labeled_rows,
    save_encoder,
)

# Topics with DISJOINT query and document vocabularies: lexical methods
# (BM25, hashing overlap) score zero; only learned co-occurrence can match.
N_TOPICS = 6
QUERY_VOCAB = [
    [f"qt{t}w{j}" for j in range(4)] for t in range(N_TOPICS)
]
DOC_VOCAB = [
    [f"dt{t}w{j}" for j in range(6)] for t in range(N_TOPICS)
]


def _sample_text(vocab, rng, n=6):
    return " ".join(rng.choice(vocab, size=n))


def _make_pairs(n_per_topic, seed):
    rng = np.random.default_rng(seed)
    pairs, negs = [], []
    for t in range(N_TOPICS):
        for _ in range(n_per_topic):
            q = _sample_text(QUERY_VOCAB[t], rng, n=3)
            pos = _sample_text(DOC_VOCAB[t], rng)
            other = (t + 1 + rng.integers(N_TOPICS - 1)) % N_TOPICS
            negs.append(_sample_text(DOC_VOCAB[other], rng))
            pairs.append((q, pos))
    return pairs, negs


def _topic_retrieval_accuracy(encoder, seed=123):
    """Held-out queries vs held-out docs: fraction whose nearest doc
    is the same topic."""
    rng = np.random.default_rng(seed)
    queries = [_sample_text(QUERY_VOCAB[t], rng, n=3) for t in range(N_TOPICS)]
    docs = [_sample_text(DOC_VOCAB[t], rng) for t in range(N_TOPICS)]
    qe = encoder.encode(queries)
    de = encoder.encode(docs)
    nearest = np.argmax(qe @ de.T, axis=1)
    return float(np.mean(nearest == np.arange(N_TOPICS)))


def _tiny_encoder(seed=0):
    cfg = EncoderConfig(vocab_size=2048, hidden_dim=64, num_layers=2,
                        num_heads=4, mlp_dim=128, max_len=32,
                        dtype="float32")
    return SentenceEncoder(cfg, seed=seed)


def test_contrastive_training_learns_cross_vocabulary_semantics(tmp_path):
    enc = _tiny_encoder()
    random_acc = _topic_retrieval_accuracy(enc)

    pairs, negs = _make_pairs(n_per_topic=24, seed=0)
    trainer = ContrastiveEncoderTrainer(
        enc,
        ContrastiveConfig(epochs=8, batch_size=48, learning_rate=1e-3,
                          max_len_query=16, max_len_chunk=32, seed=0),
    )
    history = trainer.fit(pairs, hard_negatives=negs)

    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.5, f"loss barely moved: {losses}"

    trained_acc = _topic_retrieval_accuracy(enc)
    assert trained_acc >= 0.8, (
        f"trained {trained_acc} (random was {random_acc})"
    )
    assert trained_acc > random_acc

    # save / load roundtrip preserves semantics
    path = str(tmp_path / "enc_ckpt")
    save_encoder(enc, path)
    enc2 = load_encoder(path)
    assert _topic_retrieval_accuracy(enc2) == trained_acc
    np.testing.assert_allclose(
        enc2.encode(["qt0w0 qt0w1"]), enc.encode(["qt0w0 qt0w1"]),
        rtol=1e-5, atol=1e-6,
    )


def test_pairs_from_labeled_rows():
    rows = [
        {"query_id": "q1", "query_text": "alpha", "chunk_text": "p1", "label": "1"},
        {"query_id": "q1", "query_text": "alpha", "chunk_text": "n1", "label": "0"},
        {"query_id": "q1", "query_text": "alpha", "chunk_text": "p2", "label": "1"},
        {"query_id": "q2", "query_text": "beta", "chunk_text": "p3", "label": "1"},
    ]
    pairs, hard = pairs_from_labeled_rows(rows)
    assert ("alpha", "p1") in pairs and ("alpha", "p2") in pairs
    assert ("beta", "p3") in pairs
    # q1's pairs get its negative; q2 has none -> None
    assert hard[pairs.index(("alpha", "p1"))] == "n1"
    assert hard[pairs.index(("beta", "p3"))] is None


def test_contrastive_trainer_rejects_empty():
    enc = _tiny_encoder()
    with pytest.raises(ValueError):
        ContrastiveEncoderTrainer(enc).fit([])
