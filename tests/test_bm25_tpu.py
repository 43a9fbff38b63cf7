"""DeviceBM25: exactness of the MXU lexical leg vs the host kernel."""
import numpy as np
import pytest

from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
from semanticsearch_tpu.index.bm25_tpu import DeviceBM25


def _zipf_corpus(rng, n_docs, vocab=500, doc_len=(5, 40)):
    """Zipf-ish synthetic corpus: realistic df skew so the freq/rare split
    is exercised on both sides."""
    words = [f"w{i}" for i in range(vocab)]
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    docs = []
    for _ in range(n_docs):
        ln = rng.integers(*doc_len)
        docs.append(" ".join(rng.choice(words, size=ln, p=p)))
    return docs


def _queries(rng, docs, n_queries, terms=(2, 6)):
    qs = []
    for _ in range(n_queries):
        src = docs[rng.integers(len(docs))].split()
        n = min(len(src), rng.integers(*terms))
        qs.append(" ".join(rng.choice(src, size=n)))
    return qs


@pytest.mark.parametrize("residual,weights",
                         [(True, "bf16"), (False, "bf16"), (True, "int8")])
@pytest.mark.parametrize("n_dense_terms", [8, 64, 10_000])
def test_device_bm25_matches_host_exactly(n_dense_terms, residual, weights):
    """Bit-exact parity with BM25Okapi.get_topk across dense budgets:
    tiny B (most terms rare), mid B, and B >= vocab (all terms dense) —
    with/without the residual second pass and with int8-split weights."""
    rng = np.random.default_rng(0)
    docs = _zipf_corpus(rng, 400)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=n_dense_terms, topk_device=16,
                     query_chunk=32, residual=residual, weights=weights)
    queries = _queries(rng, docs, 50)
    q_toks = [tokenize(q) for q in queries]
    k = 10
    d_idx, d_sc = dev.get_topk_batch(q_toks, k)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, k)
        np.testing.assert_array_equal(
            d_idx[qi], h_idx,
            err_msg=f"idx mismatch q={qi} B={n_dense_terms}")
        np.testing.assert_array_equal(
            d_sc[qi], h_sc,
            err_msg=f"score mismatch q={qi} B={n_dense_terms}")
    assert dev.stats["queries"] == len(queries)


def test_device_bm25_edge_queries():
    """Edge cases route correctly: OOV-only, empty, stopword-only,
    fewer-matches-than-k (zero-score fill), single-doc corpus."""
    rng = np.random.default_rng(1)
    docs = _zipf_corpus(rng, 100)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=32, topk_device=8, query_chunk=8)
    q_toks = [
        ["zzz", "not-in-vocab"],           # OOV only -> zero-fill
        [],                                 # empty query
        ["w0", "w0", "w1"],                # repeated stopword-class terms
        tokenize(docs[7])[:1],             # single frequent term
        ["w499"],                          # rarest tail term
    ]
    k = 12
    d_idx, d_sc = dev.get_topk_batch(q_toks, k)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, k)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


def test_device_bm25_certificate_rate():
    """The int8 error bound must certify nearly every query (fallbacks are
    the exception, not the path); the residual pass must certify at least
    as often as the single-matrix layout."""
    rng = np.random.default_rng(2)
    docs = _zipf_corpus(rng, 1000)
    bm = BM25Okapi([tokenize(d) for d in docs])
    q_toks = [tokenize(q) for q in _queries(rng, docs, 200)]
    dev1 = DeviceBM25(bm, n_dense_terms=128, topk_device=32, query_chunk=64,
                      residual=False)
    dev1.get_topk_batch(q_toks, 10)
    frac1 = dev1.stats["fallbacks"] / dev1.stats["queries"]
    assert frac1 < 0.2, dev1.stats
    dev2 = DeviceBM25(bm, n_dense_terms=128, topk_device=32, query_chunk=64,
                      residual=True)
    dev2.get_topk_batch(q_toks, 10)
    frac2 = dev2.stats["fallbacks"] / dev2.stats["queries"]
    assert frac2 <= frac1, (dev1.stats, dev2.stats)
    # int8 weight split: the same certification class as the bf16 split
    # (per-term leftover ~a_q/508 vs t*2^-16) — must also beat single-matrix
    dev3 = DeviceBM25(bm, n_dense_terms=128, topk_device=32, query_chunk=64,
                      residual=True, weights="int8")
    dev3.get_topk_batch(q_toks, 10)
    frac3 = dev3.stats["fallbacks"] / dev3.stats["queries"]
    assert frac3 <= frac1, (dev1.stats, dev3.stats)


def test_device_bm25_query_chunking():
    """Results are independent of the query_chunk partition."""
    rng = np.random.default_rng(3)
    docs = _zipf_corpus(rng, 150)
    bm = BM25Okapi([tokenize(d) for d in docs])
    q_toks = [tokenize(q) for q in _queries(rng, docs, 30)]
    a = DeviceBM25(bm, n_dense_terms=64, query_chunk=7).get_topk_batch(
        q_toks, 5)
    b = DeviceBM25(bm, n_dense_terms=64, query_chunk=30).get_topk_batch(
        q_toks, 5)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_hybrid_engine_with_device_lexical(tmp_path, mesh8):
    """HybridQueryEngine with cfg.lexical_device=True returns the same hits
    as the host lexical path."""
    from semanticsearch_tpu.core.config import EncoderConfig, RankingConfig
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.query_engine import HybridQueryEngine
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rng = np.random.default_rng(5)
    docs = _zipf_corpus(rng, 40, vocab=120, doc_len=(5, 15))
    rows = [{"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
             "chunk_text": t} for i, t in enumerate(docs)]
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(EncoderConfig(
        vocab_size=500, hidden_dim=32, num_layers=1, num_heads=2,
        mlp_dim=64, max_len=32, dtype="float32"))
    HybridQueryEngine.build(str(chunks), enc, str(tmp_path / "idx"),
                            mesh=mesh8)
    host = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    dev = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        rank_cfg=RankingConfig(lexical_device=True, lexical_dense_terms=32))
    queries = [" ".join(docs[i].split()[:3]) for i in (0, 7, 21)]
    h_hits = host.search(queries, k=5)
    d_hits = dev.search(queries, k=5)
    assert [[h.chunk_id for h in hs] for hs in h_hits] == \
        [[h.chunk_id for h in hs] for hs in d_hits]
    assert dev._device_bm25 is not None
    assert dev._device_bm25.stats["queries"] == 3


def test_python_reference_post_path(monkeypatch):
    """The pure-Python post-processing (used when the native lib is absent)
    stays bit-exact too."""
    import semanticsearch_tpu.native as nm

    monkeypatch.setattr(nm, "bm25_rare_touch", lambda *a, **k: None)
    monkeypatch.setattr(nm, "bm25_device_post", lambda *a, **k: None)
    rng = np.random.default_rng(9)
    docs = _zipf_corpus(rng, 300)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=32, query_chunk=16)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 40)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 8)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 8)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


@pytest.mark.parametrize("weights", ["bf16", "int8"])
def test_sharded_device_bm25_matches_host(mesh8, weights):
    """Mesh-sharded C (columns over the data axis): exact parity with the
    host kernel and with the single-device path on the 8-device mesh."""
    rng = np.random.default_rng(11)
    docs = _zipf_corpus(rng, 700)  # not divisible by 8: exercises padding
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=48, query_chunk=32,
                     mesh=mesh8, weights=weights)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 60)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 10)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


def test_block_topk_path_matches_host():
    """Corpora wide enough to engage the two-stage block selection
    (_block_topk) stay bit-exact, including at the padded tail."""
    rng = np.random.default_rng(13)
    docs = _zipf_corpus(rng, 5000, vocab=1500)  # pads 5000 -> 5120 cols
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=256, topk_device=64, query_chunk=64)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 80)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 12)
    assert (d_idx < 5000).all()
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 12)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


def test_device_bm25_invalidated_by_compact(tmp_path, mesh8):
    """Serve-time adds + compact: the device matrix is stale after compact
    (new rows, new statistics) and must rebuild; results stay exact
    throughout the add -> search -> compact -> search cycle."""
    from semanticsearch_tpu.core.config import EncoderConfig, RankingConfig
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.query_engine import HybridQueryEngine
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rng = np.random.default_rng(21)
    docs = _zipf_corpus(rng, 30, vocab=100, doc_len=(5, 15))
    rows = [{"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
             "chunk_text": t} for i, t in enumerate(docs)]
    chunks = tmp_path / "chunks.tsv"
    write_tsv(str(chunks), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(EncoderConfig(
        vocab_size=500, hidden_dim=32, num_layers=1, num_heads=2,
        mlp_dim=64, max_len=32, dtype="float32"))
    HybridQueryEngine.build(str(chunks), enc, str(tmp_path / "idx"),
                            mesh=mesh8)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        rank_cfg=RankingConfig(lexical_device=True, lexical_dense_terms=32))
    q = " ".join(docs[3].split()[:3])
    _ = engine.search([q], k=3)
    dev_before = engine._device_bm25
    assert dev_before is not None

    engine.add_documents(["c_new"], ["totally fresh glacier words here"])
    engine.compact()
    assert engine._device_bm25 is None  # stale matrix dropped
    hits = engine.search(["totally fresh glacier"], k=2)[0]
    assert engine._device_bm25 is not None
    assert engine._device_bm25 is not dev_before  # rebuilt over new stats
    assert hits[0].chunk_id == "c_new"


def test_start_finish_interleaved_matches_get_topk_batch():
    """The serve path dispatches the device phase, overlaps other host
    work, then finishes — including two handles in flight at once. Results
    must be identical to the one-shot get_topk_batch."""
    rng = np.random.default_rng(3)
    docs = _zipf_corpus(rng, 300)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=16, query_chunk=16)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 40)]
    ref_i, ref_s = dev.get_topk_batch(q_toks, 8)
    h1 = dev.start_topk_batch(q_toks[:24], 8)
    h2 = dev.start_topk_batch(q_toks[24:], 8)
    i2, s2 = dev.finish_topk_batch(h2)  # finish out of dispatch order
    i1, s1 = dev.finish_topk_batch(h1)
    np.testing.assert_array_equal(np.vstack([i1, i2]), ref_i)
    np.testing.assert_array_equal(np.vstack([s1, s2]), ref_s)


@pytest.mark.parametrize("residual,weights",
                         [(True, "bf16"), (False, "bf16"), (True, "int8")])
@pytest.mark.parametrize("n_docs", [600, 1000])
def test_chunked_scoring_matches_host(n_docs, residual, weights):
    """The column-chunked scoring loop (HBM-bounded transients at corpus
    scale, see _SCORE_CHUNK) is bit-exact vs the host kernel. 600 docs pad
    to 768 cols -> one full 512-col chunk + a 256-col remainder tail; 1000
    docs pad to 1024 -> two full chunks, no remainder."""
    rng = np.random.default_rng(7)
    docs = _zipf_corpus(rng, n_docs)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=32, query_chunk=16,
                     residual=residual, score_chunk_cols=512,
                     weights=weights)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 30)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 10)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx)
        np.testing.assert_array_equal(d_sc[qi], h_sc)


def test_chunked_scoring_sharded(mesh8):
    """Chunked scoring inside the shard_map local: each shard's columns
    run through the fori_loop body and the ICI merge stays exact."""
    rng = np.random.default_rng(8)
    # 2500 docs -> 4096-aligned cols -> 512 cols/shard = TWO 256-col
    # chunks per shard, so the fori_loop body really runs under shard_map
    docs = _zipf_corpus(rng, 2500)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=32, query_chunk=16,
                     mesh=mesh8, score_chunk_cols=256)
    q_toks = [tokenize(q) for q in _queries(rng, docs, 25)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 10)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx)
        np.testing.assert_array_equal(d_sc[qi], h_sc)


def test_cache_roundtrip_and_staleness(tmp_path):
    """The persisted int8 matrix: a second construction loads from disk
    (meta untouched -> no rebuild) and stays bit-exact; a corpus change
    invalidates the fingerprint and rebuilds; a tampered meta rebuilds."""
    import os

    rng = np.random.default_rng(11)
    docs = _zipf_corpus(rng, 300)
    bm = BM25Okapi([tokenize(d) for d in docs])
    q_toks = [tokenize(q) for q in _queries(rng, docs, 25)]
    cache = str(tmp_path / "idx")

    dev1 = DeviceBM25(bm, n_dense_terms=64, topk_device=16, query_chunk=32,
                      cache_dir=cache)
    i1, s1 = dev1.get_topk_batch(q_toks, 10)
    meta_p = os.path.join(cache, DeviceBM25._CACHE_META)
    assert os.path.exists(meta_p)
    assert os.path.exists(os.path.join(cache, DeviceBM25._CACHE_CC))
    mtime = os.path.getmtime(meta_p)

    # second construction: loads the memmap, does NOT rewrite the cache
    dev2 = DeviceBM25(bm, n_dense_terms=64, topk_device=16, query_chunk=32,
                      cache_dir=cache)
    i2, s2 = dev2.get_topk_batch(q_toks, 10)
    assert os.path.getmtime(meta_p) == mtime
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(dev1.scale, dev2.scale)

    # different corpus, same cache dir: fingerprint mismatch -> rebuild,
    # results exact for the NEW corpus
    docs_b = _zipf_corpus(rng, 300)
    bm_b = BM25Okapi([tokenize(d) for d in docs_b])
    dev3 = DeviceBM25(bm_b, n_dense_terms=64, topk_device=16,
                      query_chunk=32, cache_dir=cache)
    q_b = [tokenize(q) for q in _queries(rng, docs_b, 25)]
    d_idx, d_sc = dev3.get_topk_batch(q_b, 10)
    for qi, toks in enumerate(q_b):
        h_idx, h_sc = bm_b.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx)
        np.testing.assert_array_equal(d_sc[qi], h_sc)
    assert os.path.getmtime(meta_p) > mtime  # cache was rewritten

    # tampered meta never validates
    with open(meta_p, "w") as f:
        f.write("{}")
    dev4 = DeviceBM25(bm_b, n_dense_terms=64, topk_device=16,
                      query_chunk=32, cache_dir=cache)
    i4, _ = dev4.get_topk_batch(q_b, 10)
    np.testing.assert_array_equal(i4, d_idx)


def test_cache_through_engine(tmp_path, mesh8):
    """RankingConfig.lexical_cache persists the matrix in the index dir;
    an engine reload serves identical results from the cached memmap."""
    from semanticsearch_tpu.core.config import EncoderConfig, RankingConfig
    from semanticsearch_tpu.index.query_engine import HybridQueryEngine
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rng = np.random.default_rng(12)
    docs = _zipf_corpus(rng, 200)
    chunks = tmp_path / "chunks.tsv"
    with open(chunks, "w") as f:
        f.write("chunk_id\tquery_id\tdocument_id\tchunk_text\n")
        for i, t in enumerate(docs):
            f.write(f"c{i}\t\td{i}\t{t}\n")
    enc = SentenceEncoder(EncoderConfig(max_len=32, num_layers=1), seed=0)
    cfg = RankingConfig(lexical_device=True, lexical_dense_terms=64,
                        lexical_cache=True)
    eng = HybridQueryEngine.build(str(chunks), enc, str(tmp_path / "idx"),
                                  rank_cfg=cfg)
    r1 = eng.search([docs[3], docs[17]], k=5)
    import os
    assert os.path.exists(
        os.path.join(str(tmp_path / "idx"), "device_bm25.meta.json"))

    eng2 = HybridQueryEngine.load(str(tmp_path / "idx"), enc, rank_cfg=cfg)
    r2 = eng2.search([docs[3], docs[17]], k=5)
    assert [h.chunk_id for h in r1[0]] == [h.chunk_id for h in r2[0]]
    assert [h.chunk_id for h in r1[1]] == [h.chunk_id for h in r2[1]]


def test_engine_rebuilds_device_bm25_for_deeper_requests(tmp_path, mesh8):
    """A request deeper than the K' the device instance was built for must
    rebuild the instance (not silently degrade every query to the host
    fallback) and stay exact."""
    from semanticsearch_tpu.core.config import EncoderConfig, RankingConfig
    from semanticsearch_tpu.index.query_engine import HybridQueryEngine
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    rng = np.random.default_rng(13)
    docs = _zipf_corpus(rng, 250)
    chunks = tmp_path / "chunks.tsv"
    with open(chunks, "w") as f:
        f.write("chunk_id\tquery_id\tdocument_id\tchunk_text\n")
        for i, t in enumerate(docs):
            f.write(f"c{i}\t\td{i}\t{t}\n")
    enc = SentenceEncoder(EncoderConfig(max_len=32, num_layers=1), seed=0)
    cfg = RankingConfig(lexical_device=True, lexical_dense_terms=64,
                        lexical_topk_device=8)
    eng = HybridQueryEngine.build(str(chunks), enc, str(tmp_path / "idx"),
                                  rank_cfg=cfg)
    eng.search([docs[5]], k=3, candidates=8)
    shallow = eng._device_bm25
    assert shallow is not None and eng._device_bm25_depth == 8

    # deeper request: instance must be replaced and sized up
    hits = eng.search([docs[5]], k=3, candidates=48)[0]
    assert eng._device_bm25 is not shallow
    assert eng._device_bm25_depth == 48
    assert hits[0].chunk_id == "c5"

    # shallower request afterwards reuses the deep instance
    deep = eng._device_bm25
    eng.search([docs[9]], k=3, candidates=8)
    assert eng._device_bm25 is deep


def test_cache_sweeps_dead_builder_tmps(tmp_path):
    """Matrix-sized tmps from CRASHED builders (dead pid in the name) are
    reclaimed on the next load; a LIVE sibling's tmp is left alone."""
    import os

    rng = np.random.default_rng(14)
    docs = _zipf_corpus(rng, 120)
    bm = BM25Okapi([tokenize(d) for d in docs])
    cache = str(tmp_path / "idx")
    os.makedirs(cache)
    base = os.path.join(cache, DeviceBM25._CACHE_CC)
    dead = base + ".999999999.tmp"  # pid far beyond pid_max: never alive
    live = base + ".1.tmp"          # pid 1 (init): alive on any Linux box
    open(dead, "wb").write(b"x")
    open(live, "wb").write(b"x")

    DeviceBM25(bm, n_dense_terms=32, topk_device=8, query_chunk=16,
               cache_dir=cache)
    assert not os.path.exists(dead)
    assert os.path.exists(live)


@pytest.mark.parametrize("use_native", [True, False])
def test_pad_columns_in_device_topk_stay_exact(use_native, monkeypatch):
    """PAD-COLUMN ids (>= n_docs) enter the device top-K' when fewer than
    K' docs have positive approx scores (negative-idf matches rank below
    the pads' 0.0). The certification must treat them soundly: drop them
    from the candidate pool and bound non-candidates by 0 + err_ub instead
    of the masked -inf (which made the certificate vacuously true).
    Asserts pads REALLY were selected (via the dispatch handle), then
    bit-exact parity vs the host kernel on both post paths."""
    if not use_native:
        import semanticsearch_tpu.native as nm

        monkeypatch.setattr(nm, "bm25_rare_touch", lambda *a, **k: None)
        monkeypatch.setattr(nm, "bm25_device_post", lambda *a, **k: None)

    # 300 docs -> 512 padded cols (212 pads). Vocab dominated by very
    # common words => avg idf < 0 => the epsilon floor keeps common idfs
    # NEGATIVE (index/bm25.py:198), so c0-matching docs score below 0.
    commons = " ".join(f"c{i}" for i in range(8))
    docs = []
    for i in range(20):          # positives: contain "rare" only
        docs.append("rare rare")
    for i in range(250):         # negatives: every common word (df=250
        docs.append(commons)     # each -> raw idf ~ -1.6 -> avg idf < 0)
    for i in range(30):          # zeros: match no query term
        docs.append("mid mid")
    bm = BM25Okapi([tokenize(d) for d in docs])
    assert bm.idf[bm.vocab["c0"]] < 0  # the construction's load-bearing fact

    dev = DeviceBM25(bm, n_dense_terms=10_000, topk_device=64,
                     query_chunk=8, residual=False)
    q_toks = [["rare", "c0"]] * 3
    h = dev.start_topk_batch(q_toks, 10)
    packed = np.asarray(h[2][0][2][5])  # (Q, 2K') device result
    sel_idx = packed[:, dev.topk_device:]
    assert (sel_idx >= dev.n_docs).any(), \
        "construction failed: no pad columns selected"
    d_idx, d_sc = dev.finish_topk_batch(h)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


def test_topk_device_exceeding_score_chunk(monkeypatch):
    """K' larger than the column-chunk width must not crash the chunked
    selection (per-chunk selection caps at the chunk width — still exact,
    every candidate reachable through the running merge)."""
    rng = np.random.default_rng(16)
    docs = _zipf_corpus(rng, 600)
    bm = BM25Okapi([tokenize(d) for d in docs])
    dev = DeviceBM25(bm, n_dense_terms=64, topk_device=600,
                     query_chunk=16, score_chunk_cols=512)
    assert dev.topk_device == 600  # > one 512-col chunk
    q_toks = [tokenize(q) for q in _queries(rng, docs, 12)]
    d_idx, d_sc = dev.get_topk_batch(q_toks, 10)
    for qi, toks in enumerate(q_toks):
        h_idx, h_sc = bm.get_topk(toks, 10)
        np.testing.assert_array_equal(d_idx[qi], h_idx, err_msg=f"q={qi}")
        np.testing.assert_array_equal(d_sc[qi], h_sc, err_msg=f"q={qi}")


def test_block_topk_tie_policy_lower_id():
    """Equal scores at the kp boundary must resolve to the LOWER column id
    regardless of which block ranks higher by max — the invariant the
    chunk-merge exactness argument in select_all is built on (blocks are
    gathered in ascending id order since the tb sort)."""
    import jax.numpy as jnp

    from semanticsearch_tpu.index.bm25_tpu import _SEL_BLOCK, _block_topk

    nb = 12
    S = np.zeros((2, nb * _SEL_BLOCK), np.float32)
    planted = [11 * _SEL_BLOCK + 7, 3 * _SEL_BLOCK + 9,
               8 * _SEL_BLOCK + 1, 200]
    for c in planted:
        S[:, c] = 5.0
    vals, idx = _block_topk(jnp.asarray(S), 3)
    expect = sorted(planted)[:3]
    for q in range(2):
        assert np.asarray(vals)[q].tolist() == [5.0, 5.0, 5.0]
        assert np.asarray(idx)[q].tolist() == expect
    # below the boundary too: kp > number of planted ties pulls zeros,
    # which also tie — their ids must be the lowest remaining columns
    vals4, idx4 = _block_topk(jnp.asarray(S), 5)
    assert np.asarray(idx4)[0, :4].tolist() == sorted(planted)


def test_block_topk_stage3_exact_vs_numpy():
    """The third selection stage (sub-block max -> narrow sort) engages on
    wide gathered tiles and stays exact — values AND the lower-id tie
    policy — against a numpy stable-sort reference."""
    import jax.numpy as jnp

    from semanticsearch_tpu.index.bm25_tpu import _SEL_BLOCK, _block_topk
    from semanticsearch_tpu.ops.topk import SEL_STAGE3_MIN as _SEL_STAGE3_MIN

    rng = np.random.default_rng(7)
    kp = 40
    nb = 128                      # m = kp+8 = 48 -> tile 48*256 = 12288
    assert (kp + 8) * _SEL_BLOCK >= _SEL_STAGE3_MIN  # stage 3 engages
    Dp = nb * _SEL_BLOCK
    # few distinct values -> dense tie plateaus at every boundary
    S = rng.integers(0, 50, size=(4, Dp)).astype(np.float32)
    # plus a plateau wider than kp+8 sub-blocks sharing the global max
    S[0, rng.choice(Dp, size=3000, replace=False)] = 60.0
    vals, idx = _block_topk(jnp.asarray(S), kp)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for q in range(S.shape[0]):
        order = np.argsort(-S[q], kind="stable")[:kp]  # lower id on ties
        np.testing.assert_array_equal(idx[q], order, err_msg=f"q={q}")
        np.testing.assert_array_equal(vals[q], S[q][order], err_msg=f"q={q}")
