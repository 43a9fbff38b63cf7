"""Corpus-fit BPE subword tokenizer: training, encoding, parity, plumbing."""
import numpy as np
import pytest

from semanticsearch_tpu.models.subword import (
    CLS_ID, UNK_ID, SubwordTokenizer, train_bpe, train_bpe_from_counts,
)


def _toy_tokenizer(vocab_size=120):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "foxes jumping quickly over sleeping dogs",
        "the dogs jumped and the foxes ran quickly",
    ] * 20
    return train_bpe(texts, vocab_size=vocab_size)


def test_bpe_learns_frequent_merges():
    tok = _toy_tokenizer()
    # 'the' is the most frequent word: it must become a single piece
    assert tok.encode_word("the") != [UNK_ID]
    assert len(tok.encode_word("the")) == 1
    # morphology: an UNSEEN inflection decomposes into known pieces, not UNK
    ids = tok.encode_word("jumper")
    assert UNK_ID not in ids
    # a word with characters outside the alphabet -> UNK
    assert tok.encode_word("zzzzqqq") != []  # decomposes or UNK, never empty


def test_encode_batch_contract():
    tok = _toy_tokenizer()
    ids, mask = tok.encode_batch(["the quick fox", ""], max_len=16)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids[0, 0] == CLS_ID
    assert mask[0].sum() >= 4  # cls + 3 words
    assert mask[1].sum() == 1  # cls only
    assert ids.dtype == np.int32


def test_native_python_parity():
    """The C++ kernel must match the Python fallback bit-for-bit."""
    from semanticsearch_tpu import native as nm

    if nm.get_lib() is None:
        pytest.skip("native library unavailable")
    tok = _toy_tokenizer()
    texts = [
        "the quick fox jumps", "UPPER Case And. punct-uation!!",
        "unseen xylophone 99999", "", "a" * 300,
        "the the the " * 30,
    ]
    nat_ids, nat_mask = nm.subword_tokenize_batch(
        texts, tok._native_tables(), 32, True)
    ids_py = np.zeros((len(texts), 32), np.int32)
    mask_py = np.zeros((len(texts), 32), np.int32)
    for i, t in enumerate(texts):
        enc = tok.encode(t)[:32]
        ids_py[i, : len(enc)] = enc
        mask_py[i, : len(enc)] = 1
    np.testing.assert_array_equal(nat_ids, ids_py)
    np.testing.assert_array_equal(nat_mask, mask_py)


def test_save_load_roundtrip(tmp_path):
    tok = _toy_tokenizer()
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = SubwordTokenizer.load(p)
    assert tok2.vocab == tok.vocab
    assert tok2.vocab_size == tok.vocab_size
    a = tok.encode_batch(["quick brown foxes"], max_len=16)
    b = tok2.encode_batch(["quick brown foxes"], max_len=16)
    np.testing.assert_array_equal(a[0], b[0])


def test_load_tokenizer_resolves_subword_json(tmp_path):
    from semanticsearch_tpu.models.tokenizer import (HashingTokenizer,
                                                     load_tokenizer)

    tok = _toy_tokenizer()
    p = str(tmp_path / "tok.json")
    tok.save(p)
    resolved = load_tokenizer(p, max_len=64)
    assert isinstance(resolved, SubwordTokenizer)
    assert resolved.max_len == 64
    # missing json falls back to hashing
    fallback = load_tokenizer(str(tmp_path / "missing.json"))
    assert isinstance(fallback, HashingTokenizer)


def test_encoder_checkpoint_carries_tokenizer(tmp_path):
    """save_encoder/load_encoder round-trips the trained vocabulary with
    the weights — ids must match the embedding table they trained against."""
    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.train.encoder_train import (load_encoder,
                                                        save_encoder)

    tok = _toy_tokenizer()
    cfg = EncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                        num_layers=1, num_heads=2, mlp_dim=64, max_len=32,
                        dtype="float32")
    enc = SentenceEncoder(cfg, tokenizer=tok)
    emb = enc.encode(["the quick fox"])
    save_encoder(enc, str(tmp_path / "ckpt"))
    enc2 = load_encoder(str(tmp_path / "ckpt"))
    assert isinstance(enc2.tokenizer, SubwordTokenizer)
    emb2 = enc2.encode(["the quick fox"])
    np.testing.assert_allclose(emb, emb2, atol=1e-6)


def test_index_persists_and_restores_tokenizer(tmp_path, mesh8):
    """HybridQueryEngine.build persists tokenizer.json; load() swaps it
    into whatever encoder the caller passes (vocabulary contract)."""
    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.query_engine import HybridQueryEngine
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    tok = _toy_tokenizer()
    cfg = EncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                        num_layers=1, num_heads=2, mlp_dim=64, max_len=32,
                        dtype="float32")
    enc = SentenceEncoder(cfg, tokenizer=tok)
    rows = [{"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
             "chunk_text": t}
            for i, t in enumerate(["the quick brown fox",
                                   "sleeping dogs lie quietly",
                                   "foxes jump over dogs"])]
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    HybridQueryEngine.build(str(chunks), enc, str(tmp_path / "idx"),
                            mesh=mesh8)
    assert (tmp_path / "idx" / "tokenizer.json").exists()

    enc_fresh = SentenceEncoder(cfg, seed=0)  # default hashing tokenizer
    engine = HybridQueryEngine.load(str(tmp_path / "idx"), enc_fresh,
                                    mesh=mesh8)
    assert isinstance(enc_fresh.tokenizer, SubwordTokenizer)
    hits = engine.search(["quick brown fox"], k=2)[0]
    assert hits[0].chunk_id == "c0"


def test_cli_train_tokenizer(tmp_path):
    from semanticsearch_tpu.cli.main import main as cli_main
    from semanticsearch_tpu.data.tsv import write_tsv

    p = tmp_path / "corpus.tsv"
    write_tsv(
        str(p),
        [{"query_id": "q", "query_text": "x", "document_id": f"d{i}",
          "document": "the quick brown fox jumps over lazy dogs again",
          "label": "1"} for i in range(20)],
        ["query_id", "query_text", "document_id", "document", "label"],
    )
    out = tmp_path / "tok.json"
    rc = cli_main(["train-tokenizer", "-i", str(p), "-o", str(out),
                   "--vocab-size", "100"])
    assert rc == 0
    tok = SubwordTokenizer.load(str(out))
    assert len(tok.encode_word("the")) == 1


def test_train_from_counts_determinism():
    wc = {"running": 50, "runner": 30, "runs": 40, "jumping": 20,
          "jumper": 10}
    a = train_bpe_from_counts(wc, vocab_size=64)
    b = train_bpe_from_counts(wc, vocab_size=64)
    assert a.vocab == b.vocab


def test_encode_batch_max_len_override_paths_agree():
    """encode_batch(max_len=L) with L above the tokenizer default must
    truncate at L on BOTH the native and the Python fallback path
    (regression: the fallback capped at self.max_len first)."""
    from semanticsearch_tpu import native as nm

    tok = _toy_tokenizer()
    tok.max_len = 4
    text = "the quick fox jumps the quick fox jumps"
    ids_py = np.full((1, 12), 0, np.int32)
    enc = tok.encode(text, max_len=12)
    assert len(enc) > 4, "override must beat the default cap"
    ids_py[0, : len(enc)] = enc
    got_ids, got_mask = tok.encode_batch([text], max_len=12)
    np.testing.assert_array_equal(got_ids, ids_py)
    assert int(got_mask.sum()) == len(enc)
    if nm.get_lib() is not None:
        nat_ids, _ = nm.subword_tokenize_batch(
            [text], tok._native_tables(), 12, tok.add_cls)
        np.testing.assert_array_equal(nat_ids, ids_py)
