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
