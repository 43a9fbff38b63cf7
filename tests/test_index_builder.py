"""Index build/load roundtrip + query-through-ids flow."""
import numpy as np

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.data.tsv import write_tsv
from semanticsearch_tpu.index.builder import build_corpus_index, load_index
from semanticsearch_tpu.models.encoder import SentenceEncoder

TINY = EncoderConfig(
    vocab_size=500, hidden_dim=32, num_layers=1, num_heads=2,
    mlp_dim=64, max_len=32, dtype="float32",
)


def test_build_and_load_index_roundtrip(tmp_path, mesh8):
    chunks = [
        {"query_id": "q1", "document_id": f"d{i}", "chunk_id": f"c{i}",
         "chunk_text": f"chunk number {i} talks about topic {i % 3}"}
        for i in range(20)
    ]
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), chunks, ["query_id", "document_id", "chunk_id", "chunk_text"])

    enc = SentenceEncoder(TINY)
    meta = build_corpus_index(str(p), enc, str(tmp_path / "idx"), batch_size=8)
    assert meta["rows"] == 20 and meta["dim"] == 32

    index, chunk_ids = load_index(str(tmp_path / "idx"), mesh=mesh8)
    assert index.size == 20
    assert chunk_ids == [f"c{i}" for i in range(20)]

    # query with the exact text of chunk 7 -> its own id must rank first
    q = enc.encode(["chunk number 7 talks about topic 1"])
    res = index.search(q, k=3)
    assert chunk_ids[res.indices[0][0]] == "c7"


def test_build_resume_after_crash(tmp_path, mesh8):
    """A build killed mid-embed resumes from the durable cursor and produces
    byte-identical artifacts to an uninterrupted build."""
    import numpy as np
    import pytest

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.builder import (EMB_FILE, PROGRESS_FILE,
                                                  build_corpus_index)
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rows = [{"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
             "chunk_text": f"text number {i} with some words {i % 7}"}
            for i in range(200)]
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(EncoderConfig(
        vocab_size=500, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=16, dtype="float32"))

    # reference: uninterrupted build
    ref_dir = tmp_path / "ref"
    build_corpus_index(str(chunks), enc, str(ref_dir), batch_size=4)
    ref_emb = np.load(str(ref_dir / EMB_FILE))

    # crashing encoder: dies after 20 batches (past a 16-batch cursor commit)
    class CrashingEncoder:
        def __init__(self, inner, die_after):
            self.inner = inner
            self.cfg = inner.cfg
            self.tokenizer = inner.tokenizer
            self.calls = 0
            self.die_after = die_after

        def encode(self, texts, batch_size=256):
            self.calls += 1
            if self.calls > self.die_after:
                raise RuntimeError("simulated crash mid-build")
            return self.inner.encode(texts, batch_size=batch_size)

    out_dir = tmp_path / "resumed"
    crasher = CrashingEncoder(enc, die_after=20)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_corpus_index(str(chunks), crasher, str(out_dir),
                           batch_size=4, resume=True)
    assert (out_dir / PROGRESS_FILE).exists()

    # resume with a healthy encoder: must re-encode ONLY the tail
    counting = CrashingEncoder(enc, die_after=10**9)
    build_corpus_index(str(chunks), counting, str(out_dir),
                       batch_size=4, resume=True)
    assert counting.calls < 50  # 200/4 = 50 batches total; most skipped
    assert not (out_dir / PROGRESS_FILE).exists()
    np.testing.assert_array_equal(np.load(str(out_dir / EMB_FILE)), ref_emb)
    assert (out_dir / "ids.tsv").read_text() == \
        (ref_dir / "ids.tsv").read_text()

    # a second resume call is a no-op (meta.json completion marker)
    noop = CrashingEncoder(enc, die_after=0)
    build_corpus_index(str(chunks), noop, str(out_dir), batch_size=4,
                       resume=True)


class _CrashingEncoder:
    """Encoder wrapper that raises after ``die_after`` encode calls."""

    def __init__(self, inner, die_after):
        self.inner = inner
        self.cfg = inner.cfg
        self.tokenizer = inner.tokenizer
        self.calls = 0
        self.die_after = die_after

    def encode(self, texts, batch_size=256):
        self.calls += 1
        if self.calls > self.die_after:
            raise RuntimeError("simulated crash mid-build")
        return self.inner.encode(texts, batch_size=batch_size)


def _rows(n):
    return [{"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
             "chunk_text": f"text number {i} with some words {i % 7}"}
            for i in range(n)]


_RESUME_ENC_CFG = EncoderConfig(
    vocab_size=500, hidden_dim=16, num_layers=1, num_heads=2,
    mlp_dim=32, max_len=16, dtype="float32")


import pytest  # noqa: E402


@pytest.mark.parametrize("die_after", [1, 7, 16, 31, 45])
def test_build_resume_any_kill_point(tmp_path, die_after):
    """Randomized kill-point property (VERDICT-r3 item 8): wherever the
    build dies — before the first 16-batch cursor commit, exactly on a
    commit boundary, or just before completion — resuming produces
    byte-identical artifacts to an uninterrupted build."""
    rows = _rows(200)  # 50 batches of 4
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(_RESUME_ENC_CFG)

    ref_dir = tmp_path / "ref"
    build_corpus_index(str(chunks), enc, str(ref_dir), batch_size=4)
    from semanticsearch_tpu.index.builder import EMB_FILE

    ref_emb = np.load(str(ref_dir / EMB_FILE))

    out_dir = tmp_path / "resumed"
    crasher = _CrashingEncoder(enc, die_after=die_after)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_corpus_index(str(chunks), crasher, str(out_dir),
                           batch_size=4, resume=True)
    counting = _CrashingEncoder(enc, die_after=10 ** 9)
    build_corpus_index(str(chunks), counting, str(out_dir),
                       batch_size=4, resume=True)
    # only the un-committed tail is re-encoded: with the cursor committed
    # every 16 batches, at most 16 batches before the crash point repeat
    committed = (die_after // 16) * 16
    assert counting.calls <= 50 - committed
    np.testing.assert_array_equal(np.load(str(out_dir / EMB_FILE)), ref_emb)
    assert (out_dir / "ids.tsv").read_text() == \
        (ref_dir / "ids.tsv").read_text()


def test_resume_ignores_stale_cursor_from_different_corpus(tmp_path):
    """A progress cursor written for a DIFFERENT row count must not be
    trusted: the rebuild starts from row 0 instead of slicing a stale
    memmap into the new corpus."""
    import json

    from semanticsearch_tpu.index.builder import EMB_FILE, PROGRESS_FILE

    enc = SentenceEncoder(_RESUME_ENC_CFG)
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), _rows(40),
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    out_dir = tmp_path / "idx"
    # die after the first 16-batch cursor commit so a progress file exists
    crasher = _CrashingEncoder(enc, die_after=17)
    with pytest.raises(RuntimeError):
        build_corpus_index(str(chunks), crasher, str(out_dir),
                           batch_size=2, resume=True)
    prog = json.load(open(out_dir / PROGRESS_FILE))
    assert prog["n_rows"] == 40

    # corpus grows: cursor is for 40 rows, input now has 60
    write_tsv(str(chunks), _rows(60),
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    counting = _CrashingEncoder(enc, die_after=10 ** 9)
    build_corpus_index(str(chunks), counting, str(out_dir),
                       batch_size=2, resume=True)
    assert counting.calls == 30  # ALL 60/2 batches re-encoded

    ref_dir = tmp_path / "ref"
    build_corpus_index(str(chunks), enc, str(ref_dir), batch_size=2)
    np.testing.assert_array_equal(
        np.load(str(out_dir / EMB_FILE)), np.load(str(ref_dir / EMB_FILE)))


def test_loaded_index_sharded_search_matches_brute(tmp_path, mesh8, rng):
    """Mesh-sharded search over a built index == numpy brute force on the
    same f16 embeddings (the load/search path the serve stack uses)."""
    n = 64
    rows = _rows(n)
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(TINY)
    build_corpus_index(str(chunks), enc, str(tmp_path / "idx"), batch_size=8)
    from semanticsearch_tpu.core.config import IndexConfig

    # f32 index dtype so numpy brute force is an exact-order oracle (the
    # serve-default bf16 path is covered by the query-engine tests)
    index, chunk_ids = load_index(str(tmp_path / "idx"), mesh=mesh8,
                                  cfg=IndexConfig(dtype="float32"))

    queries = enc.encode([f"text number {i} with some words" for i in (3, 11)])
    res = index.search(np.asarray(queries, np.float32), k=7)

    from semanticsearch_tpu.index.builder import EMB_FILE

    emb = np.load(str(tmp_path / "idx" / EMB_FILE)).astype(np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    scores = np.asarray(queries) @ emb.T
    brute = np.argsort(-scores, axis=1)[:, :7]
    got = np.asarray(res.indices)
    # order-insensitive on the k set (f32 summation-order near-ties),
    # top-1 exact
    for qi in range(got.shape[0]):
        assert got[qi, 0] == brute[qi, 0]
        assert set(got[qi].tolist()) == set(brute[qi].tolist())


def test_builder_rejects_wrong_text_column(tmp_path):
    """A wrong text_column must fail fast, not silently embed N empty
    strings into a useless index."""
    import pytest

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.builder import build_corpus_index
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rows = [{"chunk_id": "c0", "chunk_text": "some text here"}]
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), rows, ["chunk_id", "chunk_text"])
    enc = SentenceEncoder(EncoderConfig(
        vocab_size=200, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=16, dtype="float32"))
    with pytest.raises(KeyError, match="text column"):
        build_corpus_index(str(p), enc, str(tmp_path / "idx"),
                           text_column="text")
