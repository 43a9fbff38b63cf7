import numpy as np

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.models.encoder import SentenceEncoder
from semanticsearch_tpu.models.tokenizer import HashingTokenizer

TINY = EncoderConfig(
    vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4,
    mlp_dim=128, max_len=64, dtype="float32",
)


def test_tokenizer_deterministic_and_padded():
    tok = HashingTokenizer(vocab_size=1000, max_len=16)
    ids1, mask1 = tok.encode_batch(["Hello, World!", "hello world"])
    ids2, _ = tok.encode_batch(["Hello, World!", "hello world"])
    np.testing.assert_array_equal(ids1, ids2)
    # same words modulo case/punct -> same token ids (after CLS)
    np.testing.assert_array_equal(ids1[0, :3], ids1[1, :3])
    assert ids1.shape == (2, 16)
    assert mask1[0].sum() == 3  # CLS + 2 words


def test_encoder_unit_norm_and_order():
    enc = SentenceEncoder(TINY)
    texts = ["a first sentence", "another one entirely", "a first sentence"]
    embs = enc.encode(texts)
    assert embs.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-4)
    # identical texts -> identical embeddings; different texts differ
    np.testing.assert_allclose(embs[0], embs[2], rtol=1e-5)
    assert not np.allclose(embs[0], embs[1])


def test_encoder_batch_invariance():
    enc = SentenceEncoder(TINY)
    texts = [f"sentence number {i} with some words" for i in range(10)]
    full = enc.encode(texts, batch_size=10)
    split = enc.encode(texts, batch_size=3)
    np.testing.assert_allclose(full, split, rtol=1e-4, atol=1e-5)


def test_encoder_sharded_matches_single(mesh8):
    enc_single = SentenceEncoder(TINY, seed=7)
    enc_sharded = SentenceEncoder(TINY, mesh=mesh8, seed=7)
    texts = [f"text {i}" for i in range(9)]  # not divisible by 8 on purpose
    e1 = enc_single.encode(texts)
    e2 = enc_sharded.encode(texts)
    np.testing.assert_allclose(e1, e2, rtol=1e-3, atol=1e-4)


def test_encoder_mask_isolation():
    # Padding must not leak: same text in different bucket lengths agrees.
    enc = SentenceEncoder(TINY)
    short = enc.encode(["tiny text"])  # bucket 64 (max for this cfg)
    again = enc.encode(["tiny text", "x " * 50])  # same bucket, longer batch
    np.testing.assert_allclose(short[0], again[0], rtol=1e-4, atol=1e-5)


def test_encode_device_matches_encode():
    """encode_device returns the same embeddings as encode (device-resident,
    input order preserved across buckets and chunks)."""
    import numpy as np

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    enc = SentenceEncoder(EncoderConfig(
        vocab_size=300, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=64, dtype="float32"))
    # mix of lengths spanning buckets, batch smaller than the text count
    texts = (["short text"] * 5
             + ["a much longer text " * 8] * 5
             + ["mid size sentence here with words"] * 5)
    ref = enc.encode(texts, batch_size=4)
    dev = np.asarray(enc.encode_device(texts, batch_size=4))
    np.testing.assert_allclose(ref, dev, atol=1e-6)
