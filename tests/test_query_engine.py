"""Hybrid serve-time query engine: build, load, dense+BM25 RRF fusion."""
import numpy as np

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.data.tsv import write_tsv
from semanticsearch_tpu.index.query_engine import HybridQueryEngine
from semanticsearch_tpu.models.encoder import SentenceEncoder

TINY = EncoderConfig(vocab_size=500, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_len=32, dtype="float32")


def _chunks(tmp_path):
    rows = [
        {"chunk_id": f"c{i}", "query_id": "", "document_id": f"d{i}",
         "chunk_text": text}
        for i, text in enumerate([
            "volcanic eruption spewed lava and ash across the island",
            "the fishing quota for trawlers was reduced this season",
            "solar panels convert sunlight into electricity efficiently",
            "the ancient aqueduct carried water to the roman city",
            "high speed trains run between the two capital stations",
            "bees pollinate flowers and produce honey in the hive",
        ])
    ]
    p = tmp_path / "chunks.tsv"
    write_tsv(str(p), rows, ["chunk_id", "query_id", "document_id", "chunk_text"])
    return str(p)


def test_hybrid_engine_build_search_load(tmp_path, mesh8):
    enc = SentenceEncoder(TINY)
    engine = HybridQueryEngine.build(
        _chunks(tmp_path), enc, str(tmp_path / "idx"), mesh=mesh8)

    # Lexical query: BM25 leg must pull the exact-word match to the top.
    hits = engine.search(["fishing quota trawlers"], k=3)[0]
    assert hits[0].chunk_id == "c1"
    assert hits[0].lexical_rank == 1

    # Dense-only still works.
    dense_hits = engine.search(["bees and honey"], k=2, hybrid=False)[0]
    assert len(dense_hits) == 2

    # Reload from disk gives the same top hit.
    engine2 = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    hits2 = engine2.search(["fishing quota trawlers"], k=3)[0]
    assert hits2[0].chunk_id == hits[0].chunk_id


def _train_tiny_reranker(ckpt_dir, corpus_texts):
    """Train a tiny KNRM on synthetic pairs and persist the serving artifact
    layout (checkpoint + preprocessor.json, as CVEvaluator.run_model writes)."""
    from semanticsearch_tpu.core.config import TrainConfig
    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.trainer import RerankTrainer
    from semanticsearch_tpu.train.vocab import Preprocessor

    queries = ["fishing quota trawlers", "bees and honey", "solar electricity"]
    rel = {0: 1, 1: 5, 2: 2}  # query -> relevant corpus row
    pp = Preprocessor(fixed_length_left=8, fixed_length_right=24,
                      filter_low_freq=1)
    pp.fit(queries + list(corpus_texts))
    lefts, rights, labels, qids = [], [], [], []
    for qi, q in enumerate(queries):
        for ci, text in enumerate(corpus_texts):
            lefts.append(q)
            rights.append(text)
            labels.append(1.0 if ci == rel[qi] else 0.0)
            qids.append(qi)
    enc = pp.transform_pair(lefts, rights)
    ds = PairDataset(left=enc["left"], right=enc["right"],
                     labels=np.array(labels), query_ids=np.array(qids))
    cfg = TrainConfig(model="knrm", epochs=2, batch_size=4, num_neg=1,
                      embedding_dim=16)
    trainer = RerankTrainer("knrm", vocab_size=pp.vocab_size, cfg=cfg)
    trainer.fit(ds, checkpoint_dir=str(ckpt_dir))
    pp.save(str(ckpt_dir / "preprocessor.json"))


def test_serve_time_rerank(tmp_path, mesh8):
    """Neural rerank stage: reorders (never replaces) the RRF head, attaches
    scores, keeps the tail, and errors cleanly when misconfigured."""
    import pytest

    enc = SentenceEncoder(TINY)
    chunks = _chunks(tmp_path)
    HybridQueryEngine.build(chunks, enc, str(tmp_path / "idx"), mesh=mesh8)

    from semanticsearch_tpu.data.tsv import read_tsv

    corpus_texts = [r["chunk_text"] for r in read_tsv(chunks)]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)

    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    # the loaded texts must be the REAL chunk texts (a header-alias bug once
    # read them all back as "" — rerank silently scored empty strings)
    assert engine.texts == corpus_texts
    queries = ["fishing quota trawlers", "bees and honey"]
    plain = engine.search(queries, k=6)
    reranked = engine.search(queries, k=6, rerank_top=4)
    for qi in range(len(queries)):
        # head: same candidate SET as RRF top-4, ordered by rerank score
        head_ids = {h.chunk_id for h in reranked[qi][:4]}
        assert head_ids == {h.chunk_id for h in plain[qi][:4]}
        head_scores = [h.rerank_score for h in reranked[qi][:4]]
        assert all(s is not None for s in head_scores)
        assert head_scores == sorted(head_scores, reverse=True)
        # tail beyond the rerank head keeps the RRF order, unscored
        assert [h.chunk_id for h in reranked[qi][4:]] == [
            h.chunk_id for h in plain[qi][4:]
        ]
        assert all(h.rerank_score is None for h in reranked[qi][4:])

    # determinism: same call twice -> identical ordering and scores
    again = engine.search(queries, k=6, rerank_top=4)
    assert [[h.chunk_id for h in hits] for hits in again] == [
        [h.chunk_id for h in hits] for hits in reranked
    ]

    # misconfiguration errors are loud, not silent no-ops
    bare = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    with pytest.raises(ValueError, match="no reranker"):
        bare.search(queries, k=3, rerank_top=2)


# ------------------------------------------------------ serve-stack hardening

def _build_engine(tmp_path, mesh8, name="idx"):
    enc = SentenceEncoder(TINY)
    engine = HybridQueryEngine.build(
        _chunks(tmp_path), enc, str(tmp_path / name), mesh=mesh8)
    return enc, engine


class _CrashAt:
    """os.replace wrapper that raises on the n-th call (1-based)."""

    def __init__(self, n, real):
        self.n = n
        self.real = real
        self.calls = 0

    def __call__(self, src, dst):
        self.calls += 1
        if self.calls == self.n:
            raise RuntimeError("simulated crash (kill -9) during compact")
        return self.real(src, dst)


def test_compact_crash_before_commit_rolls_back(tmp_path, mesh8, monkeypatch):
    """A compact killed BEFORE the commit journal lands must leave the old
    artifact set fully intact: load() rolls back (sweeps tmps) and serves
    the pre-compact corpus."""
    import os
    import pytest
    from semanticsearch_tpu.index import query_engine as qe

    enc, engine = _build_engine(tmp_path, mesh8)
    engine.add_documents(["c_new"], ["glaciers calve icebergs into the fjord"])
    crash = _CrashAt(1, os.replace)  # call 1 = the journal rename
    monkeypatch.setattr(qe.os, "replace", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        engine.compact()
    monkeypatch.setattr(qe.os, "replace", crash.real)

    idx_dir = str(tmp_path / "idx")
    assert any(n.endswith(".tmp") for n in os.listdir(idx_dir))
    fresh = HybridQueryEngine.load(idx_dir, enc, mesh=mesh8)
    assert not any(n.endswith(".tmp") for n in os.listdir(idx_dir))
    assert len(fresh.chunk_ids) == 6  # the delta add did NOT commit
    hits = fresh.search(["fishing quota trawlers"], k=3)[0]
    assert hits[0].chunk_id == "c1"


def test_compact_crash_mid_rename_rolls_forward(tmp_path, mesh8, monkeypatch):
    """A compact killed BETWEEN renames (journal durable, artifact set mixed)
    must roll FORWARD at next load: the compacted corpus serves, nothing is
    truncated or mixed."""
    import os
    import pytest
    from semanticsearch_tpu.index import query_engine as qe

    enc, engine = _build_engine(tmp_path, mesh8)
    engine.add_documents(["c_new"], ["glaciers calve icebergs into the fjord"])
    engine.remove_documents(["c0"])
    # call 1 = journal commit, calls 2..6 = artifacts; crash after 2 landed
    crash = _CrashAt(4, os.replace)
    monkeypatch.setattr(qe.os, "replace", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        engine.compact()
    monkeypatch.setattr(qe.os, "replace", crash.real)

    idx_dir = str(tmp_path / "idx")
    assert os.path.exists(os.path.join(idx_dir, qe.COMMIT_JOURNAL))
    fresh = HybridQueryEngine.load(idx_dir, enc, mesh=mesh8)
    assert not os.path.exists(os.path.join(idx_dir, qe.COMMIT_JOURNAL))
    assert not any(n.endswith(".tmp") for n in os.listdir(idx_dir))
    # compacted corpus: 6 - 1 tombstone + 1 delta add
    assert len(fresh.chunk_ids) == 6
    assert "c0" not in fresh.chunk_ids and "c_new" in fresh.chunk_ids
    hits = fresh.search(["glaciers icebergs fjord"], k=2)[0]
    assert hits[0].chunk_id == "c_new"
    # texts stayed row-aligned through the recovery
    assert fresh.texts[fresh.chunk_ids.index("c_new")].startswith("glaciers")


def test_search_all_tombstoned(tmp_path, mesh8):
    """Tombstoning every document yields empty result lists, not a crash."""
    enc, engine = _build_engine(tmp_path, mesh8)
    n = engine.remove_documents([f"c{i}" for i in range(6)])
    assert n == 6
    res = engine.search(["fishing quota trawlers", "bees"], k=3)
    assert res == [[], []]


def test_remove_documents_unknown_ids(tmp_path, mesh8):
    enc, engine = _build_engine(tmp_path, mesh8)
    assert engine.remove_documents(["nope", "also-nope"]) == 0
    # removing the same id twice counts once
    assert engine.remove_documents(["c2", "c2"]) == 1
    assert engine.remove_documents(["c2"]) == 0


def test_search_k_exceeds_corpus(tmp_path, mesh8):
    """k and candidate depth beyond the corpus size clamp cleanly."""
    enc, engine = _build_engine(tmp_path, mesh8)
    res = engine.search(["solar electricity panels"], k=50)[0]
    assert 0 < len(res) <= 6
    assert res[0].chunk_id == "c2"


def test_search_empty_query_batch(tmp_path, mesh8):
    enc, engine = _build_engine(tmp_path, mesh8)
    assert engine.search([], k=3) == []


def test_rerank_top_exceeds_hit_count(tmp_path, mesh8):
    """rerank_top larger than the number of fused hits reranks what exists."""
    from semanticsearch_tpu.data.tsv import read_tsv

    enc, engine = _build_engine(tmp_path, mesh8)
    corpus_texts = [r["chunk_text"] for r in read_tsv(_chunks(tmp_path))]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"))
    res = engine.search(["fishing quota trawlers"], k=6, rerank_top=100)[0]
    assert 0 < len(res) <= 6
    assert all(h.rerank_score is not None for h in res)


def test_search_after_remove_keeps_k_full(tmp_path, mesh8):
    """Over-fetch: tombstoning docs must not shrink the result list while
    live docs remain."""
    enc, engine = _build_engine(tmp_path, mesh8)
    engine.remove_documents(["c1", "c4"])
    res = engine.search(["the water city station island"], k=4)[0]
    assert len(res) == 4
    assert {h.chunk_id for h in res}.isdisjoint({"c1", "c4"})


def test_score_pairs_block_ladder_consistency():
    """Large-block packing (dispatch-then-fetch) scores identically to
    small-block scoring: pad rows never leak into real rows' scores and
    block boundaries don't reorder accumulation per row."""
    import jax

    from semanticsearch_tpu.core.config import TrainConfig
    from semanticsearch_tpu.index.rerank_service import (
        SCORE_BATCH, SCORE_BATCH_LARGE, SCORE_BATCH_MID, RerankService)
    from semanticsearch_tpu.models.rerankers import make_model
    from semanticsearch_tpu.train.vocab import Preprocessor

    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(words[i % 40: i % 40 + 5]) for i in range(60)]
    pp = Preprocessor(fixed_length_left=8, fixed_length_right=24,
                      filter_low_freq=1)
    pp.fit(texts)
    model = make_model("knrm", vocab_size=pp.vocab_size, embed_dim=16)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((2, 8), np.int32), np.zeros((2, 24), np.int32),
    )["params"]
    svc = RerankService("knrm", params, pp,
                        cfg=TrainConfig(model="knrm", embedding_dim=16))
    # one full LARGE block, one full MID, one full SMALL, plus a padded
    # SMALL tail — every ladder rung incl. its padding
    n = SCORE_BATCH_LARGE + SCORE_BATCH_MID + SCORE_BATCH + 44
    qs = [texts[i % len(texts)] for i in range(n)]
    cs = [texts[(i * 7 + 3) % len(texts)] for i in range(n)]
    whole = svc.score_pairs(qs, cs)
    assert whole.shape == (n,)
    parts = np.concatenate([
        svc.score_pairs(qs[s: s + 200], cs[s: s + 200])
        for s in range(0, n, 200)
    ])
    np.testing.assert_allclose(whole, parts, rtol=1e-5, atol=1e-6)


def test_http_server_search_and_health(tmp_path, mesh8):
    """The resident HTTP endpoint (index/server.py): health check, batched
    search over real sockets, malformed-request handling — all against a
    live server thread."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from semanticsearch_tpu.index.server import make_server

    _enc, engine = _build_engine(tmp_path, mesh8, name="srv_idx")
    srv = make_server(engine, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True and health["docs"] == 6

        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"queries": ["fishing quota trawlers",
                                         "bees and honey"],
                             "k": 3}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2
        assert out["results"][0][0]["chunk_id"] == "c1"
        assert out["results"][0][0]["lexical_rank"] == 1
        assert len(out["results"][1]) == 3

        # server-side answers match the in-process engine exactly
        direct = engine.search(["fishing quota trawlers"], k=3)[0]
        assert [h["chunk_id"] for h in out["results"][0]] == \
            [h.chunk_id for h in direct]

        # malformed bodies are a 400, not a dead server
        bad = urllib.request.Request(
            f"{base}/search", data=b'{"queries": []}', method="POST")
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_http_server_freshness_endpoints(tmp_path, mesh8):
    """Serve-time freshness over the wire: /add makes a doc searchable on
    the next request, /remove tombstones it, /compact folds the delta —
    all reflected in /healthz's live doc count."""
    import json
    import threading
    import urllib.request

    from semanticsearch_tpu.index.server import make_server

    _enc, engine = _build_engine(tmp_path, mesh8, name="srv_fresh")
    srv = make_server(engine, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"

    def post(path, obj, timeout=120):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(obj).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    def docs():
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            return json.loads(r.read())["docs"]

    try:
        assert docs() == 6
        out = post("/add", {"chunk_ids": ["c_new"],
                            "texts": ["quantum computer runs shor "
                                      "algorithm on qubits"]})
        assert out == {"added": 1, "docs": 7}
        hits = post("/search", {"queries": ["quantum qubits shor"],
                                "k": 3})["results"][0]
        assert hits[0]["chunk_id"] == "c_new"

        out = post("/remove", {"chunk_ids": ["c_new"]})
        assert out == {"removed": 1, "docs": 6}
        hits = post("/search", {"queries": ["quantum qubits shor"],
                                "k": 3})["results"][0]
        assert all(h["chunk_id"] != "c_new" for h in hits)

        out = post("/compact", {}, timeout=300)
        assert out["ok"] is True and out["docs"] == 6
        hits = post("/search", {"queries": ["fishing quota trawlers"],
                                "k": 3})["results"][0]
        assert hits[0]["chunk_id"] == "c1"
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


class _StubServeEngine:
    """Fake engine for coalescing tests: records every search call's batch
    shape, optionally sleeps (so concurrent requests pile up behind the
    dispatcher), and returns deterministic per-query hits."""

    def __init__(self, search_delay_s=0.0, fail=False):
        from semanticsearch_tpu.index.query_engine import Hit

        self._hit = Hit
        self.calls = []  # (n_queries, k) per engine.search call
        self.search_delay_s = search_delay_s
        self.fail = fail

        class _Idx:
            size = 0

        self.index = _Idx()
        self._delta = None
        self._dead = set()
        self._device_bm25 = None

    # The coalescing dispatcher drives the engine through the pipelined
    # dispatch/finish split (query_engine._dispatch_legs/_finish_legs);
    # the stub mirrors that protocol and keeps search() = dispatch+finish.
    def _dispatch_legs(self, queries, k, candidates, hybrid):
        self.calls.append((len(queries), k))
        if self.fail:
            raise RuntimeError("boom")
        return {"queries": list(queries)}

    def _finish_legs(self, state, k, rerank_top):
        import time as _t

        if self.search_delay_s:
            _t.sleep(self.search_delay_s)
        return [[self._hit(chunk_id=f"{q}#{r}", score=float(k - r))
                 for r in range(k)] for q in state["queries"]]

    def search(self, queries, k=10, hybrid=True, rerank_top=0):
        return self._finish_legs(
            self._dispatch_legs(queries, k, None, hybrid), k, rerank_top)


def _start(srv):
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return t, f"http://{srv.server_address[0]}:{srv.server_address[1]}"


def _post_json(base, path, obj, timeout=60):
    import json
    import urllib.request

    req = urllib.request.Request(
        f"{base}{path}", data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_coalescer_merges_concurrent_searches():
    """Concurrent small /search requests merge into few engine.search calls
    (the continuous-batching serve mode), every client still gets exactly
    its own results, and requests with different k never share a batch."""
    import json
    import threading
    import urllib.request

    from semanticsearch_tpu.index.server import make_server

    eng = _StubServeEngine(search_delay_s=0.05)
    srv = make_server(eng, port=0, coalesce=True, max_wait_ms=100.0)
    t, base = _start(srv)
    try:
        n_clients, results, errors = 12, {}, []
        barrier = threading.Barrier(n_clients)

        def client(i):
            k = 3 if i % 2 == 0 else 5  # two param groups
            qs = [f"q{i}a", f"q{i}b"]
            barrier.wait()
            try:
                results[i] = (k, qs, _post_json(
                    base, "/search", {"queries": qs, "k": k}))
            except Exception as exc:  # collected, asserted below
                errors.append(exc)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert not errors

        # every client got exactly its own queries' hits at its own k
        for i, (k, qs, out) in results.items():
            assert len(out["results"]) == 2
            for q, hits in zip(qs, out["results"]):
                assert len(hits) == k
                assert [h["chunk_id"] for h in hits] == \
                    [f"{q}#{r}" for r in range(k)]

        # the 12 requests (24 queries) rode far fewer engine calls: the
        # first call's 50ms sleep queues the rest, which merge per k-group
        assert sum(n for n, _ in eng.calls) >= 24  # pow2 padding adds rows
        assert len(eng.calls) <= 6, eng.calls
        assert any(n > 2 for n, _ in eng.calls), eng.calls  # real merging
        # merged batches are padded to powers of two (bounded jit shapes)
        assert all(n & (n - 1) == 0 for n, _ in eng.calls), eng.calls
        # no call mixed k groups (k is jit-static downstream)
        with urllib.request.urlopen(f"{base}/statz", timeout=30) as r:
            stats = json.loads(r.read())["coalesce"]
        assert stats["batches"] == len(eng.calls)
        assert stats["merged_requests"] >= 2
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_coalescer_failure_isolated_per_batch():
    """An engine failure 500s every request in the doomed batch but leaves
    the server (and dispatcher) serving."""
    import urllib.error
    import urllib.request

    from semanticsearch_tpu.index.server import make_server

    eng = _StubServeEngine(fail=True)
    srv = make_server(eng, port=0, coalesce=True, max_wait_ms=1.0)
    t, base = _start(srv)
    try:
        try:
            _post_json(base, "/search", {"queries": ["x"], "k": 2})
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500 and "boom" in e.read().decode()
        eng.fail = False
        out = _post_json(base, "/search", {"queries": ["x"], "k": 2})
        assert [h["chunk_id"] for h in out["results"][0]] == ["x#0", "x#1"]
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_serial_server_survives_connection_burst():
    """A burst of concurrent clients against the SERIAL (coalesce=off)
    server must all be answered. Waiting clients sit in the listen(2)
    backlog while the accept loop drains one request at a time; the stdlib
    default backlog of 5 made the kernel drop handshake ACKs under a 64-way
    burst and the clients died with ECONNRESET mid-response (seen in
    bench_serve --http-clients 64 at 1M docs, where one request holds the
    engine for seconds). Regression: both server classes size the backlog
    for bursts, and a real 32-way burst completes cleanly."""
    import threading

    from semanticsearch_tpu.index import server as server_mod

    # the configuration that caused the resets: burst-depth backlogs
    assert server_mod._SerialHTTPServer.request_queue_size >= 64
    assert server_mod._CoalescingHTTPServer.request_queue_size >= 64

    eng = _StubServeEngine(search_delay_s=0.02)
    srv = server_mod.make_server(eng, port=0)  # serial mode
    t, base = _start(srv)
    try:
        n_clients, done, errors = 32, [], []
        barrier = threading.Barrier(n_clients)

        def client(i):
            barrier.wait()
            try:
                out = _post_json(base, "/search",
                                 {"queries": [f"q{i}"], "k": 2}, timeout=120)
                assert out["results"][0][0]["chunk_id"] == f"q{i}#0"
                done.append(i)
            except Exception as exc:  # collected, asserted below
                errors.append((i, exc))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors, errors[:3]
        assert len(done) == n_clients
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_http_server_coalesce_real_engine(tmp_path, mesh8):
    """Coalescing mode end-to-end against a real engine: concurrent clients
    get byte-identical answers to the in-process engine, and mutations
    (which pass through the same dispatcher) stay sequentially consistent
    for the issuing client."""
    import threading

    from semanticsearch_tpu.index.server import make_server

    _enc, engine = _build_engine(tmp_path, mesh8, name="srv_coal")
    direct = engine.search(["fishing quota trawlers", "bees and honey"], k=3)
    srv = make_server(engine, port=0, coalesce=True, max_wait_ms=50.0)
    t, base = _start(srv)
    try:
        outs, errors = {}, []
        barrier = threading.Barrier(2)

        def client(i, q):
            barrier.wait()
            try:
                outs[i] = _post_json(
                    base, "/search", {"queries": [q], "k": 3}, timeout=300)
            except Exception as exc:
                errors.append(exc)

        ths = [threading.Thread(target=client, args=(0, "fishing quota trawlers")),
               threading.Thread(target=client, args=(1, "bees and honey"))]
        for th in ths:
            th.start()
        for th in ths:
            th.join(timeout=300)
        assert not errors
        for i in (0, 1):
            assert [h["chunk_id"] for h in outs[i]["results"][0]] == \
                [h.chunk_id for h in direct[i]]

        # add-then-search from one client is sequentially consistent
        out = _post_json(base, "/add", {
            "chunk_ids": ["c_coal"],
            "texts": ["tokamak fusion reactor confines plasma"]})
        assert out["added"] == 1
        hits = _post_json(base, "/search", {
            "queries": ["tokamak plasma fusion"], "k": 3},
            timeout=300)["results"][0]
        assert hits[0]["chunk_id"] == "c_coal"
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_http_serial_connection_hygiene(tmp_path, mesh8):
    """Serial mode must (1) close the connection after every response so an
    idle keep-alive client can't head-of-line block the single accept loop,
    and (2) answer malformed Content-Length with 411 + close instead of
    desyncing the HTTP stream."""
    import json
    import socket
    import threading
    import urllib.request

    from semanticsearch_tpu.index.server import make_server

    _enc, engine = _build_engine(tmp_path, mesh8, name="hyg_idx")
    srv = make_server(engine, port=0)  # serial mode
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    try:
        req = urllib.request.Request(f"http://{host}:{port}/healthz")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
            assert r.headers.get("Connection") == "close"

        # malformed Content-Length over a raw socket: 411, then EOF (the
        # server must drop the connection, not read a body of unknown size)
        with socket.create_connection((host, port), timeout=30) as s:
            s.sendall(b"POST /search HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: abc\r\n\r\n")
            buf = b""
            while b"\r\n\r\n" not in buf:
                chunk = s.recv(4096)
                if not chunk:
                    break
                buf += chunk
            assert b" 411 " in buf.split(b"\r\n", 1)[0], buf[:200]
            # drain until EOF — a desynced server would keep the socket open
            s.settimeout(10)
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break

        # the server still serves after the malformed client
        with urllib.request.urlopen(f"http://{host}:{port}/healthz",
                                    timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_dense_index_k_zero_is_empty():
    """k=0 must return an empty result, not silently substitute cfg.top_k
    (the old `k or cfg.top_k` treated 0 as 'unset')."""
    import numpy as np

    from semanticsearch_tpu.index.engine import EmbeddingIndex

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((32, 8)).astype(np.float32)
    idx = EmbeddingIndex.build(emb)
    res = idx.search(emb[:3], k=0)
    assert res.scores.shape == (3, 0) and res.indices.shape == (3, 0)
    # and None still means the configured default
    res_def = idx.search(emb[:3], k=None)
    assert res_def.indices.shape[1] == idx.cfg.top_k


def test_search_pipelined_matches_search(tmp_path, mesh8):
    """Cross-batch pipelining returns exactly what per-batch search()
    returns — same hits, scores, and ranks — including empty batches,
    dense-only mode, and after serve-time adds (delta leg in flight)."""
    enc = SentenceEncoder(TINY)
    engine = HybridQueryEngine.build(
        _chunks(tmp_path), enc, str(tmp_path / "idx"), mesh=mesh8)
    engine = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    engine.add_documents(
        ["c6"], ["wind turbines generate power offshore"])

    batches = [
        ["fishing quota trawlers", "bees and honey"],
        [],
        ["solar electricity", "roman aqueduct water", "wind power offshore"],
    ]
    piped = engine.search_pipelined(batches, k=3)
    assert [len(b) for b in piped] == [2, 0, 3]
    for qb, got in zip(batches, piped):
        ref = engine.search(qb, k=3)
        assert len(ref) == len(got)
        for hits_ref, hits_got in zip(ref, got):
            assert [(h.chunk_id, h.score, h.dense_rank, h.lexical_rank)
                    for h in hits_got] == \
                   [(h.chunk_id, h.score, h.dense_rank, h.lexical_rank)
                    for h in hits_ref]

    # dense-only through the same split path
    piped_d = engine.search_pipelined(batches[:1], k=2, hybrid=False)
    ref_d = engine.search(batches[0], k=2, hybrid=False)
    assert [(h.chunk_id, h.score) for h in piped_d[0][0]] == \
           [(h.chunk_id, h.score) for h in ref_d[0]]


def test_coalescer_pipelining_mutation_barrier():
    """The dispatcher may hold one dispatched batch in flight while it
    collects the next; a mutation arriving behind it must only run AFTER
    that batch's results are delivered (finish barrier), and the batch's
    clients must never observe post-mutation state."""
    import threading
    import time as _t

    from semanticsearch_tpu.index.server import _Coalescer, _Op

    eng = _StubServeEngine(search_delay_s=0.05)
    order = []
    orig_finish = eng._finish_legs

    def finish_logged(state, k, rerank_top):
        out = orig_finish(state, k, rerank_top)
        order.append("finish")
        return out

    eng._finish_legs = finish_logged
    co = _Coalescer(eng, max_batch=8, max_wait_s=0.02)
    try:
        search_op = _Op("search", queries=["a", "b"], params=(2, True, 0))
        mutate_op = _Op("mutate", fn=lambda: order.append("mutate"))
        t1 = threading.Thread(target=co.submit, args=(search_op,))
        t1.start()
        _t.sleep(0.005)  # let the search hit the dispatcher first
        t2 = threading.Thread(target=co.submit, args=(mutate_op,))
        t2.start()
        t1.join(timeout=30)
        t2.join(timeout=30)
        assert search_op.error is None and mutate_op.error is None
        assert order == ["finish", "mutate"], order
        assert len(search_op.result) == 2
    finally:
        co.shutdown()


def test_search_pipelined_with_rerank_matches(tmp_path, mesh8):
    """Pipelined batches with the neural rerank stage: identical hits and
    rerank scores vs per-batch search (the rerank block runs inside
    _finish_legs, overlapped by the next batch's dispatch)."""
    enc = SentenceEncoder(TINY)
    chunks = _chunks(tmp_path)
    HybridQueryEngine.build(chunks, enc, str(tmp_path / "idx"), mesh=mesh8)

    from semanticsearch_tpu.data.tsv import read_tsv

    corpus_texts = [r["chunk_text"] for r in read_tsv(chunks)]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"))

    batches = [["fishing quota trawlers", "bees and honey"],
               ["solar electricity"]]
    piped = engine.search_pipelined(batches, k=6, rerank_top=4)
    for qb, got in zip(batches, piped):
        ref = engine.search(qb, k=6, rerank_top=4)
        for hits_ref, hits_got in zip(ref, got):
            assert [(h.chunk_id, h.score, h.rerank_score) for h in hits_got] \
                == [(h.chunk_id, h.score, h.rerank_score) for h in hits_ref]


def test_coalescer_search_never_jumps_carried_mutation():
    """A search that arrives AFTER a mutation must not be absorbed into an
    earlier batch while that mutation still waits in carry — arrival order
    across op kinds is a documented guarantee (a client whose add was
    acknowledged as queued must not then see a pre-add search result)."""
    import threading
    import time as _t

    from semanticsearch_tpu.index.server import _Coalescer, _Op

    eng = _StubServeEngine(search_delay_s=0.15)
    order = []
    orig_dispatch = eng._dispatch_legs

    def dispatch_logged(queries, k, candidates, hybrid):
        order.append(("search", len(queries), k))
        return orig_dispatch(queries, k, candidates, hybrid)

    eng._dispatch_legs = dispatch_logged
    co = _Coalescer(eng, max_batch=8, max_wait_s=0.1)
    try:
        ops = [
            _Op("search", queries=["a"], params=(3, True, 0)),   # A
            _Op("search", queries=["b"], params=(5, True, 0)),   # B: carried
            _Op("mutate", fn=lambda: order.append("mutate")),    # M: carried
            _Op("search", queries=["d"], params=(5, True, 0)),   # D: after M
        ]
        threads = []
        for i, op in enumerate(ops):
            _t.sleep(0.03 if i else 0.0)
            th = threading.Thread(target=co.submit, args=(op,))
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=30)
        assert all(op.error is None for op in ops)
        # D (same params as B) must NOT have merged into B's batch: the
        # mutation between them is a barrier. Expected: A, B alone (1
        # query), mutate, then D.
        assert order == [("search", 1, 3), ("search", 1, 5), "mutate",
                         ("search", 1, 5)], order
    finally:
        co.shutdown()


def test_rerank_blend_interpolates_fusion_and_reranker_order(tmp_path, mesh8):
    """ranking.rerank_blend: 0.0 keeps the fusion order (reranker inert but
    scores attached), 1.0 is the pure reranker reorder, and a mid blend is
    exactly the rank-RRF mix of the two orders."""
    import dataclasses

    from semanticsearch_tpu.data.tsv import read_tsv

    enc = SentenceEncoder(TINY)
    chunks = _chunks(tmp_path)
    HybridQueryEngine.build(chunks, enc, str(tmp_path / "idx"), mesh=mesh8)
    corpus_texts = [r["chunk_text"] for r in read_tsv(chunks)]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    queries = ["fishing quota trawlers", "bees and honey"]
    top = 4
    plain = engine.search(queries, k=6)
    pure = engine.search(queries, k=6, rerank_top=top)  # blend default 1.0

    engine.cfg = dataclasses.replace(engine.cfg, rerank_blend=0.0)
    frozen = engine.search(queries, k=6, rerank_top=top)
    for qi in range(len(queries)):
        assert [h.chunk_id for h in frozen[qi]] == [
            h.chunk_id for h in plain[qi]], "blend=0 must keep fusion order"
        assert all(h.rerank_score is not None for h in frozen[qi][:top])

    engine.cfg = dataclasses.replace(engine.cfg, rerank_blend=0.5)
    mixed = engine.search(queries, k=6, rerank_top=top)
    kk = engine.cfg.rrf_k
    for qi in range(len(queries)):
        fusion_ids = [h.chunk_id for h in plain[qi][:top]]
        pure_ids = [h.chunk_id for h in pure[qi][:top]]
        # expected: rank-RRF combination of the two orders
        rr_rank = {cid: r for r, cid in enumerate(pure_ids, start=1)}
        combined = {
            cid: 0.5 / (kk + rr_rank[cid]) + 0.5 / (kk + j + 1)
            for j, cid in enumerate(fusion_ids)
        }
        expected = sorted(
            fusion_ids,
            key=lambda cid: (-combined[cid], fusion_ids.index(cid)))
        assert [h.chunk_id for h in mixed[qi][:top]] == expected
        # tail untouched by any blend
        assert [h.chunk_id for h in mixed[qi][top:]] == [
            h.chunk_id for h in plain[qi][top:]]


def test_tune_rerank_blend_and_persisted_apply(tmp_path, mesh8):
    """tune_rerank_blend grid-searches beta against the live engine; the
    tuned value persists in fusion.json and load() auto-applies it when
    ranking.rerank_blend is left at its 1.0 default."""
    import json as _json
    import os as _os

    import pytest

    from semanticsearch_tpu.data.tsv import read_tsv
    from semanticsearch_tpu.index.query_engine import FUSION_FILE

    enc = SentenceEncoder(TINY)
    chunks = _chunks(tmp_path)
    HybridQueryEngine.build(chunks, enc, str(tmp_path / "idx"), mesh=mesh8)
    corpus_texts = [r["chunk_text"] for r in read_tsv(chunks)]
    _train_tiny_reranker(tmp_path / "ckpt", corpus_texts)
    engine = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    queries = ["fishing quota trawlers", "bees and honey"]
    relevant = [["c1"], ["c5"]]

    beta, best_map, table = engine.tune_rerank_blend(
        queries, relevant, rerank_top=4)
    assert beta in table and table[beta] == best_map
    assert 0.0 <= best_map <= 1.0
    assert set(table) >= {0.0, 0.5, 1.0}
    # every beta's MAP is a real AP over the same fused candidates
    assert all(0.0 <= v <= 1.0 for v in table.values())
    # ties break toward 1.0 (reference pure-rescoring semantics)
    top = max(table.values())
    expect = max((b for b in table if table[b] == top),
                 key=lambda b: -abs(b - 1.0))
    assert beta == expect

    # persist + auto-apply on a fresh load
    with open(_os.path.join(str(tmp_path / "idx"), FUSION_FILE), "w") as f:
        _json.dump({"fusion_alpha": 0.7, "rerank_blend": 0.25}, f)
    engine2 = HybridQueryEngine.load(
        str(tmp_path / "idx"), enc, mesh=mesh8,
        reranker_dir=str(tmp_path / "ckpt"),
    )
    assert engine2.cfg.fusion_alpha == 0.7
    assert engine2.cfg.rerank_blend == 0.25

    # misconfiguration is loud
    bare = HybridQueryEngine.load(str(tmp_path / "idx"), enc, mesh=mesh8)
    with pytest.raises(ValueError, match="reranker"):
        bare.tune_rerank_blend(queries, relevant)
