"""Invariants of the round-4 measurement tooling itself: the realistic
corpus generator (tools/eval_chunking.py) and the purity metric its A/B
conclusions rest on, plus the enrichment corpus's label consistency.

The A/B numbers in BASELINE.md are only as good as these generators;
pinning their invariants keeps reruns comparable across rounds."""
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _load(name):
    path = os.path.join(REPO, "tools", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_chunking_corpus_realistic_stats_and_labels():
    ec = _load("eval_chunking")
    spec = ec.CorpusSpec(16, 2000, seed=77)
    corpus = ec.build_corpus(spec, 0, docs_per_topic=6, max_words=6000,
                             n_filler_docs=20, n_trap_docs=10)
    docs, doc_topics = corpus["docs"], corpus["doc_topics"]
    wc = np.array([len(d.split()) for d in docs])
    # distribution targets (document_length_summary.json shape): stubs
    # exist, median in the low hundreds, long tail well past the median
    assert wc.min() < 45, "no stub docs generated"
    assert 100 <= np.median(wc) <= 700, np.median(wc)
    assert wc.max() > 4 * np.median(wc), "no long tail"
    # every topic reachable: docs_per_topic passages per topic (a doc can
    # host two passages of one topic, so DISTINCT docs may be fewer)
    counts = {}
    for ts in doc_topics:
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    assert set(counts) == set(range(16))
    assert all(c >= 4 for c in counts.values()), counts
    # gold passages recorded for encoder training: exactly 6 per topic
    per_topic = {}
    for t, _k, _txt in corpus["passages"]:
        per_topic[t] = per_topic.get(t, 0) + 1
    assert all(per_topic[t] == 6 for t in range(16)), per_topic
    # determinism: same seed, same corpus
    again = ec.build_corpus(ec.CorpusSpec(16, 2000, seed=77), 0, 6, 6000,
                            20, 10)
    assert again["docs"] == docs


def test_chunking_query_splits_disjoint_and_labeled():
    ec = _load("eval_chunking")
    spec = ec.CorpusSpec(8, 500, seed=3)
    corpus = ec.build_corpus(spec, 1, 4, 2000, 6, 4)
    q1, t1 = ec.query_split(spec, 10, 2)
    q2, t2 = ec.query_split(spec, 11, 2)
    assert set(q1) != set(q2), "query splits must differ across seeds"
    lab = ec.doc_labels(t1, corpus["doc_topics"])
    assert lab.shape == (len(q1), len(corpus["docs"]))
    assert lab.sum(axis=1).min() >= 1, "every query must have relevant docs"


def test_purity_metric_semantics():
    ec = _load("eval_chunking")
    spec = ec.CorpusSpec(4, 100, seed=0)
    pure_chunk = "doc0word1 doc0word2s doc0word3ing filler1 filler2."
    mixed = "doc0word1 doc0word2 doc1word3 doc1word4 doc1word5."
    p, multi = ec.chunk_purity([pure_chunk], spec.dv_stems)
    assert p == 1.0 and multi == 0.0
    p, multi = ec.chunk_purity([mixed], spec.dv_stems)
    assert abs(p - 3 / 5) < 1e-9 and multi == 1.0
    # chunks with <3 topic tokens are skipped, not counted as pure
    p, multi = ec.chunk_purity(["filler only text here."], spec.dv_stems)
    assert p == 1.0 and multi == 0.0  # vacuous default


def test_enrich_corpus_trap_docs_contain_all_query_terms():
    eo = _load("eval_oie_enrich")
    docs, queries, train_queries, labels = eo.build_corpus(8, seed=0)
    assert labels.shape == (8, len(docs))
    # hard-distractor property: for each topic, at least one irrelevant
    # doc contains every query term (scattered)
    for qi, q in enumerate(queries):
        terms = q.split()
        irr = np.nonzero(labels[qi] == 0)[0]
        assert any(all(t in docs[di] for t in terms) for di in irr), q
    # train phrasings differ from eval queries
    for qi in range(8):
        assert queries[qi] not in train_queries[qi]
