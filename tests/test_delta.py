"""Serve-time incremental index updates: delta search, merge, compaction."""
import numpy as np

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.data.tsv import write_tsv
from semanticsearch_tpu.index.query_engine import HybridQueryEngine
from semanticsearch_tpu.models.encoder import SentenceEncoder

TINY = EncoderConfig(vocab_size=500, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_len=32, dtype="float32")

BASE_TEXTS = [
    "volcanic eruption spewed lava and ash across the island",
    "the fishing quota for trawlers was reduced this season",
    "solar panels convert sunlight into electricity efficiently",
    "the ancient aqueduct carried water to the roman city",
]


def _build(tmp_path, mesh8):
    rows = [
        {"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
         "chunk_text": t}
        for i, t in enumerate(BASE_TEXTS)
    ]
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(TINY)
    return HybridQueryEngine.build(str(p), enc, str(tmp_path / "idx"),
                                   mesh=mesh8)


def test_add_documents_and_search(tmp_path, mesh8):
    engine = _build(tmp_path, mesh8)
    base = engine.index.size

    # before the add: the new doc's exact words find nothing lexical
    pre = engine.search(["glacier meltwater feeds mountain lake"], k=3)[0]
    assert all(h.lexical_rank == 0 for h in pre)

    engine.add_documents(
        ["new0", "new1"],
        ["glacier meltwater feeds mountain lake",
         "honey bees pollinate the orchard flowers"],
    )
    assert len(engine.chunk_ids) == base + 2
    hits = engine.search(["glacier meltwater feeds mountain lake"], k=3)[0]
    # exact-match doc must surface, found by BOTH legs
    assert hits[0].chunk_id == "new0"
    assert hits[0].lexical_rank == 1
    assert hits[0].dense_rank >= 1

    # main-corpus docs still retrievable, scores unpolluted by the delta
    hits2 = engine.search(["fishing quota trawlers"], k=2)[0]
    assert hits2[0].chunk_id == "c1"

    # dense-only path merges the delta too
    d = engine.search(["honey bees pollinate the orchard flowers"], k=2,
                      hybrid=False)[0]
    assert d[0].chunk_id == "new1"


def test_compact_folds_delta(tmp_path, mesh8):
    engine = _build(tmp_path, mesh8)
    engine.add_documents(["new0"],
                         ["glacier meltwater feeds mountain lake"])
    before = engine.search(["glacier meltwater feeds mountain lake"],
                           k=3)[0]
    engine.compact()
    assert engine._delta is None
    assert engine.index.size == len(BASE_TEXTS) + 1
    after = engine.search(["glacier meltwater feeds mountain lake"],
                          k=3)[0]
    assert after[0].chunk_id == before[0].chunk_id == "new0"
    # lexical leg now uses UN-frozen stats over the full corpus
    assert after[0].lexical_rank == 1

    # original ids.tsv metadata columns survive compaction
    from semanticsearch_tpu.data.tsv import read_tsv

    ids_rows = list(read_tsv(str(tmp_path / "idx" / "ids.tsv")))
    assert ids_rows[1]["document_id"] == "d1"
    assert ids_rows[-1]["chunk_id"] == "new0"

    # a fresh engine loads the compacted layout from disk
    enc = engine.encoder
    reloaded = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    assert len(reloaded.chunk_ids) == len(BASE_TEXTS) + 1
    again = reloaded.search(["glacier meltwater feeds mountain lake"],
                            k=3)[0]
    assert again[0].chunk_id == "new0"
    # and supports further adds
    reloaded.add_documents(["new1"], ["honey bees pollinate the orchard"])
    more = reloaded.search(["honey bees pollinate the orchard"], k=2)[0]
    assert more[0].chunk_id == "new1"


def test_delta_index_growth_and_exactness():
    """DeltaIndex: capacity doubling keeps all rows searchable and exact."""
    from semanticsearch_tpu.index.delta import DeltaIndex

    rng = np.random.default_rng(0)
    d = 16
    di = DeltaIndex(dim=d, init_capacity=4)
    all_rows = []
    for batch in (3, 4, 9):  # forces two capacity doublings
        emb = rng.standard_normal((batch, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        di.add(emb)
        all_rows.append(emb)
    mat = np.concatenate(all_rows)
    q = rng.standard_normal((5, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # search returns a FIXED 64-bucketed width (jit-static k: adds must not
    # recompile) with pad entries at NEG_INF; the top-k live entries lead
    vals, idx = di.search(q, k=4)
    assert vals.shape[1] >= 4
    assert (vals[:, : di.n] > -1e29).all()  # live entries are real scores
    if vals.shape[1] > di.n:
        assert (vals[:, di.n:] <= -1e29).all()  # pad is NEG_INF
    ref = q @ mat.T
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(idx[:, :4], ref_idx)
    np.testing.assert_allclose(
        vals[:, :4], np.take_along_axis(ref, ref_idx, axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_remove_documents_and_compact(tmp_path, mesh8):
    """Tombstoned docs vanish from results immediately (both legs, with
    over-fetch keeping k full) and are dropped physically by compact."""
    engine = _build(tmp_path, mesh8)
    n0 = engine.index.size

    top = engine.search(["fishing quota trawlers"], k=2)[0]
    assert top[0].chunk_id == "c1"
    assert engine.remove_documents(["c1"]) == 1
    assert engine.remove_documents(["c1"]) == 0  # idempotent

    after = engine.search(["fishing quota trawlers"], k=2)[0]
    ids = [h.chunk_id for h in after]
    assert "c1" not in ids and len(ids) == 2  # k stays full via over-fetch

    # removal composes with serve-time adds
    engine.add_documents(["new0"], ["fresh fishing quota rules for trawlers"])
    mixed = engine.search(["fishing quota trawlers"], k=3)[0]
    mixed_ids = [h.chunk_id for h in mixed]
    assert mixed_ids[0] == "new0" and "c1" not in mixed_ids

    engine.compact()
    assert engine.index.size == n0  # -1 removed +1 added
    assert "c1" not in engine.chunk_ids
    final = engine.search(["fishing quota trawlers"], k=3)[0]
    assert final[0].chunk_id == "new0"
    assert "c1" not in [h.chunk_id for h in final]

    # reload from disk: the tombstoned doc is physically gone
    reloaded = HybridQueryEngine.load(str(tmp_path / "idx"), engine.encoder,
                                     mesh=mesh8)
    assert "c1" not in reloaded.chunk_ids
    assert len(reloaded.texts) == n0


def test_randomized_delta_consistency(tmp_path, mesh8):
    """Property test: an engine mutated through random add/remove/compact
    steps returns the same hit sets as an engine BUILT from scratch over
    the equivalent final corpus (delta merge, tombstones, frozen-stats
    differences must never change WHICH documents surface on clear
    queries)."""
    rng = np.random.default_rng(3)
    vocabs = [[f"topic{t}word{j}" for j in range(6)] for t in range(8)]

    def make_text(t):
        return " ".join(rng.choice(vocabs[t], size=8))

    live: dict = {}
    next_id = 0
    rows = []
    for t in range(4):
        cid = f"c{next_id}"
        next_id += 1
        live[cid] = (t, make_text(t))
        rows.append({"chunk_id": cid, "query_id": "", "document_id": cid,
                     "chunk_text": live[cid][1]})
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), rows,
              ["chunk_id", "query_id", "document_id", "chunk_text"])
    enc = SentenceEncoder(TINY)
    engine = HybridQueryEngine.build(str(p), enc, str(tmp_path / "idx"),
                                     mesh=mesh8)

    for step in range(6):
        op = rng.choice(["add", "remove", "compact"])
        if op == "add" or len(live) < 3:
            t = int(rng.integers(8))
            cid = f"c{next_id}"
            next_id += 1
            live[cid] = (t, make_text(t))
            engine.add_documents([cid], [live[cid][1]])
        elif op == "remove":
            cid = str(rng.choice(sorted(live)))
            del live[cid]
            assert engine.remove_documents([cid]) == 1
        else:
            engine.compact()

        # reference: an engine built fresh over the current live corpus
        ref_rows = [
            {"chunk_id": cid, "query_id": "", "document_id": cid,
             "chunk_text": text}
            for cid, (t, text) in sorted(live.items())
        ]
        rp = tmp_path / f"ref{step}.tsv"
        write_tsv(str(rp), ref_rows,
                  ["chunk_id", "query_id", "document_id", "chunk_text"])
        ref = HybridQueryEngine.build(str(rp), enc,
                                      str(tmp_path / f"ridx{step}"),
                                      mesh=mesh8)
        # one clear query per topic that has live docs: the topic's own
        # vocabulary — top-1 must agree on the DOCUMENT it surfaces
        by_topic: dict = {}
        for cid, (t, text) in live.items():
            by_topic.setdefault(t, []).append(cid)
        for t, cids in sorted(by_topic.items()):
            q = " ".join(vocabs[t][:3])
            got = engine.search([q], k=1)[0][0].chunk_id
            want = ref.search([q], k=1)[0][0].chunk_id
            assert got in cids, (
                f"step {step} topic {t}: mutated engine surfaced {got}, "
                f"not a live doc of the topic"
            )
            assert want in cids


def test_full_serve_stack_integration(tmp_path, mesh8):
    """Everything at once on the 8-device mesh: sharded main index + delta
    adds + tombstones + neural rerank of the merged candidates."""
    from tests.test_query_engine import _train_tiny_reranker

    engine = _build(tmp_path, mesh8)
    from semanticsearch_tpu.data.tsv import read_tsv

    corpus_texts = [r["chunk_text"]
                    for r in read_tsv(str(tmp_path / "chunks.tsv"))]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), engine.encoder, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    engine.add_documents(["new0"], ["glacier meltwater feeds mountain lake"])
    engine.remove_documents(["c0"])

    hits = engine.search(
        ["glacier meltwater feeds mountain lake", "fishing quota trawlers"],
        k=4, rerank_top=3,
    )
    for qh in hits:
        ids = [h.chunk_id for h in qh]
        assert "c0" not in ids  # tombstone filtered everywhere
        # rerank head annotated and sorted
        head = [h for h in qh if h.rerank_score is not None]
        assert len(head) == 3
        scores = [h.rerank_score for h in head]
        assert scores == sorted(scores, reverse=True)
    # the delta doc is rerankable (its text exists) and findable
    assert "new0" in [h.chunk_id for h in hits[0]]


def test_delta_bm25_native_path_engages(monkeypatch):
    """DeltaBM25.score must hand the native scorer int32 doc termids.

    Regression: an int64 termids array failed the wrapper's dtype assert on
    EVERY call, silently degrading delta scoring to the pure-Python triple
    loop on the serve thread (and burning the one-shot native-failure
    warning). The native result must also equal the Python reference."""
    import pytest

    from semanticsearch_tpu import native
    from semanticsearch_tpu.index import bm25 as bm25_mod
    from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
    from semanticsearch_tpu.index.delta import DeltaBM25

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    failures = []
    monkeypatch.setattr(bm25_mod, "_warn_native_failure", failures.append)
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    docs = [" ".join(words[t] for t in rng.integers(0, 40, size=10))
            for _ in range(12)]
    bm = BM25Okapi([tokenize(d) for d in docs])
    dbm = DeltaBM25(bm)
    dbm.add([tokenize(" ".join(docs[i].split()[:5]) + " neverseen")
             for i in range(4)])
    queries = [tokenize(docs[0]), tokenize("neverseen " + docs[3])]
    got = dbm.score(queries)
    assert not failures, f"native delta scorer failed: {failures}"

    # force the pure-Python loop and compare
    monkeypatch.setattr(native, "bm25_score_batch", None)
    ref = dbm.score(queries)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
