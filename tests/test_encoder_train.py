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
    fit_with_mining,
    load_encoder,
    mine_hard_negatives,
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


def test_mine_hard_negatives_is_argmax_over_nonrelevant():
    """The mined negative must be exactly the highest-scoring corpus text
    under the CURRENT encoder once the query's relevant rows are masked."""
    enc = _tiny_encoder()
    rng = np.random.default_rng(7)
    queries = [_sample_text(QUERY_VOCAB[t], rng, n=3) for t in range(3)]
    corpus = [_sample_text(DOC_VOCAB[t % N_TOPICS], rng) for t in range(12)]
    relevant = [[0, 1], [2], []]

    negs = mine_hard_negatives(enc, queries, corpus, relevant)

    qe = enc.encode(queries)
    de = enc.encode(corpus)
    scores = qe @ de.T
    for i, rel in enumerate(relevant):
        row = scores[i].copy()
        row[np.asarray(rel, dtype=np.int64)] = -np.inf
        assert negs[i] == corpus[int(np.argmax(row))]
        assert negs[i] not in [corpus[r] for r in rel]


def test_mine_hard_negatives_rank_floor_skips_top_hits():
    enc = _tiny_encoder()
    rng = np.random.default_rng(11)
    queries = [_sample_text(QUERY_VOCAB[0], rng, n=3)]
    corpus = [_sample_text(DOC_VOCAB[t % N_TOPICS], rng) for t in range(8)]

    floor0 = mine_hard_negatives(enc, queries, corpus, [[]], rank_floor=0)
    floor2 = mine_hard_negatives(enc, queries, corpus, [[]], rank_floor=2)
    scores = (enc.encode(queries) @ enc.encode(corpus).T)[0]
    order = np.argsort(-scores)
    assert floor0[0] == corpus[int(order[0])]
    assert floor2[0] == corpus[int(order[2])]

    # floor beyond the corpus clamps to the last row instead of crashing
    tail = mine_hard_negatives(enc, queries, corpus, [[]], rank_floor=99)
    assert tail[0] == corpus[int(order[-1])]


def test_mine_hard_negatives_rejects_length_mismatch():
    enc = _tiny_encoder()
    with pytest.raises(ValueError):
        mine_hard_negatives(enc, ["a", "b"], ["doc"], [[0]])


def test_fit_with_mining_trains_and_tags_rounds():
    enc = _tiny_encoder()
    rng = np.random.default_rng(3)
    pairs, negs = _make_pairs(n_per_topic=16, seed=3)
    # corpus = the positives; each pair's relevant rows = all positives of
    # its own topic (pairs are emitted topic-major, 16 per topic)
    corpus = [p[1] for p in pairs]
    rel = [list(range((i // 16) * 16, (i // 16 + 1) * 16))
           for i in range(len(pairs))]

    cfg = ContrastiveConfig(epochs=3, batch_size=48, learning_rate=1e-3,
                            max_len_query=16, max_len_chunk=32, seed=0)
    history = fit_with_mining(enc, cfg, pairs, corpus, rel,
                              initial_negatives=negs, rounds=2)

    assert len(history) == 6  # 2 rounds x 3 epochs
    assert [h["round"] for h in history] == [0, 0, 0, 1, 1, 1]
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.7, f"loss barely moved: {losses}"
    assert _topic_retrieval_accuracy(enc) >= 0.8

    with pytest.raises(ValueError):
        fit_with_mining(enc, cfg, pairs, corpus, rel, rounds=0)
