"""BM25 parity, RRF semantics, hybrid ranker labeling, sharded engine recall."""
import numpy as np
import pytest

from semanticsearch_tpu.core.config import IndexConfig, RankingConfig
from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
from semanticsearch_tpu.index.engine import EmbeddingIndex
from semanticsearch_tpu.index.ranker import (
    QueryGroup,
    percentile_labels,
    rank_and_filter_groups,
    rank_group,
)
from semanticsearch_tpu.index.rrf import ranks_from_scores, rrf_fuse

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over a sleepy canine",
    "completely unrelated text about stock markets and bonds",
    "the dog sat quietly near the fox den",
    "stock prices rose while bond yields fell",
]


def _np_bm25_reference(corpus_tokens, query_tokens, k1=1.5, b=0.75, eps=0.25):
    """Independent dense implementation of rank_bm25's BM25Okapi formula."""
    n = len(corpus_tokens)
    vocab = sorted({t for d in corpus_tokens for t in d})
    v = {t: i for i, t in enumerate(vocab)}
    tf = np.zeros((n, len(vocab)))
    for i, d in enumerate(corpus_tokens):
        for t in d:
            tf[i, v[t]] += 1
    df = (tf > 0).sum(axis=0)
    idf = np.log(n - df + 0.5) - np.log(df + 0.5)
    idf = np.where(idf < 0, eps * idf.mean(), idf)
    dl = tf.sum(axis=1)
    avgdl = dl.mean()
    scores = np.zeros(n)
    for t in query_tokens:
        if t not in v:
            continue
        f = tf[:, v[t]]
        scores += idf[v[t]] * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
    return scores


def test_bm25_matches_formula():
    toks = [tokenize(t) for t in CORPUS]
    bm = BM25Okapi(toks)
    q = tokenize("fox over the dog")
    got = bm.get_scores(q)
    want = _np_bm25_reference(toks, q)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bm25_repeated_query_terms_multiplicity():
    """rank_bm25 accumulates a term's contribution once per query occurrence;
    a repeated query term must score exactly double (ADVICE round 1)."""
    toks = [tokenize(t) for t in CORPUS]
    bm = BM25Okapi(toks)
    q_dup = tokenize("fox fox dog")
    want = _np_bm25_reference(toks, q_dup)
    np.testing.assert_allclose(bm.get_scores(q_dup), want, rtol=1e-5, atol=1e-6)
    # batch path (native C++ when available, python fallback otherwise)
    batch = bm.get_scores_batch([q_dup, tokenize("fox dog")])
    np.testing.assert_allclose(batch[0], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        batch[1], _np_bm25_reference(toks, tokenize("fox dog")),
        rtol=1e-5, atol=1e-6,
    )


def test_bm25_batch_matches_single():
    toks = [tokenize(t) for t in CORPUS]
    bm = BM25Okapi(toks)
    queries = [tokenize("fox dog"), tokenize("stock bond yields"), ["zzz"]]
    batch = bm.get_scores_batch(queries)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batch[i], bm.get_scores(q), rtol=1e-5, atol=1e-6)


def test_bm25_topk_matches_full_scan():
    """Inverted-index get_topk must equal stable argsort over get_scores —
    including tie order and repeated query terms."""
    toks = [tokenize(t) for t in CORPUS]
    bm = BM25Okapi(toks)
    for q in ["fox over the dog", "fox fox dog", "stock bond", "zzz"]:
        qt = tokenize(q)
        full = bm.get_scores(qt)
        want = np.argsort(-full, kind="stable")[:3]
        idx, scores = bm.get_topk(qt, 3)
        np.testing.assert_array_equal(idx, want)
        np.testing.assert_allclose(scores, full[idx], rtol=1e-5, atol=1e-6)


def test_bm25_topk_boundary_ties_stable():
    """Duplicate documents create exact score ties AT the k-th boundary;
    get_topk must pick the same lower-id docs in the same order as a stable
    full-scan argsort (round-2 advisor finding: argpartition selected an
    arbitrary tied subset)."""
    docs = ["tied words here"] * 7 + ["other text entirely", "more filler"]
    toks = [tokenize(t) for t in docs]
    bm = BM25Okapi(toks)
    qt = tokenize("tied words")
    full = bm.get_scores(qt)
    for k in (3, 5, 8):
        want = np.argsort(-full, kind="stable")[:k]
        idx, scores = bm.get_topk(qt, k)
        np.testing.assert_array_equal(idx, want)
        np.testing.assert_allclose(scores, full[idx], rtol=1e-5, atol=1e-6)
    # repeated calls reuse the accumulator cleanly
    idx2, _ = bm.get_topk(qt, 5)
    np.testing.assert_array_equal(idx2, np.argsort(-full, kind="stable")[:5])


def test_ranks_from_scores_ties_positional():
    scores = np.array([0.5, 0.9, 0.5, 0.1])
    ranks = ranks_from_scores(scores)
    assert ranks[1] == 1  # best
    assert {ranks[0], ranks[2]} == {2, 3}  # tie broken by position
    assert ranks[0] < ranks[2]
    assert ranks[3] == 4


def test_rrf_fuse_matches_reference_formula():
    cos = np.array([0.9, 0.2, 0.5])
    bm = np.array([1.0, 3.0, 2.0])
    rrf = rrf_fuse([cos, bm], k=60)
    want = 1.0 / (60 + np.array([1, 3, 2])) + 1.0 / (60 + np.array([3, 1, 2]))
    np.testing.assert_allclose(rrf, want)


def test_percentile_labels():
    rrf = np.linspace(0, 1, 10)
    labels = percentile_labels(rrf, RankingConfig(upper_percentile=80, lower_percentile=20))
    assert (labels == 1).sum() == 2   # top 20%
    assert (labels == 0).sum() == 2   # bottom 20%
    assert (labels == -1).sum() == 6  # middle filtered


def _hash_embed(texts):
    """Deterministic pseudo-embedder for tests."""
    out = np.zeros((len(texts), 64), dtype=np.float32)
    for i, t in enumerate(texts):
        rng = np.random.default_rng(abs(hash(t)) % (2**32))
        out[i] = rng.standard_normal(64)
    return out


def test_rank_and_filter_groups_end_to_end():
    groups = [
        QueryGroup(
            query_id="q1",
            query_text="fox and dog",
            chunk_ids=[f"c{i}" for i in range(len(CORPUS))],
            chunk_texts=CORPUS,
        ),
        QueryGroup(query_id="q2", query_text="tiny", chunk_texts=["only one"]),
    ]
    out = rank_and_filter_groups(groups, _hash_embed)
    # q2 skipped (group < min size); q1 yields labeled rows sorted by rrf desc
    assert all(r.query_id == "q1" for r in out)
    assert all(r.label in (0, 1) for r in out)
    rrfs = [r.rrf_score for r in out]
    assert rrfs == sorted(rrfs, reverse=True)
    assert any(r.label == 1 for r in out) and any(r.label == 0 for r in out)


@pytest.mark.parametrize("n,d,k", [(230, 128, 10)])
def test_embedding_index_recall_parity_sharded(mesh8, rng, n, d, k):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    idx = EmbeddingIndex.build(corpus, mesh=mesh8)
    res = idx.search(queries, k=k)

    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    # recall@k parity vs brute force (BASELINE.md target)
    for row_got, row_want in zip(res.indices, brute):
        recall = len(set(row_got) & set(row_want)) / k
        assert recall == 1.0


def test_embedding_index_recall_parity_hybrid_mesh(rng):
    """EmbeddingIndex on a ("dcn","data") hybrid mesh routes through the
    hierarchical 2-level merge and stays exact."""
    from semanticsearch_tpu.core.mesh import hybrid_mesh

    n, d, k = 230, 128, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    idx = EmbeddingIndex.build(corpus, mesh=hybrid_mesh(2))
    res = idx.search(queries, k=k)

    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for row_got, row_want in zip(res.indices, brute):
        assert len(set(row_got) & set(row_want)) / k == 1.0


def test_sharded_topk_negative_scores_with_padding(mesh8, rng):
    """Zero pad rows (score 0) must not displace real candidates with
    negative cosine inside the padded shard's local top-k (ADVICE round 1).
    229 rows over 8 shards -> 3 pad rows in the last shard; every real score
    is made negative so any pad leakage would corrupt the top-k."""
    n, d, k = 229, 64, 10
    base = np.zeros(d, np.float32)
    base[0] = 1.0
    corpus = base[None, :] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    corpus[:, 0] = np.abs(corpus[:, 0]) + 0.2  # every row points +e1-ward
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = np.zeros((4, d), np.float32)
    queries[:, 0] = -1.0  # exact anti-direction: all cosines negative
    assert (queries @ corpus.T).max() < 0  # construction check

    # f32 index dtype: the point is pad-row exclusion, not bf16 tie-breaking
    idx = EmbeddingIndex.build(corpus, mesh=mesh8, cfg=IndexConfig(dtype="float32"))
    res = idx.search(queries, k=k)
    assert (res.indices < n).all()
    brute = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for row_got, row_want in zip(res.indices, brute):
        assert len(set(row_got) & set(row_want)) == k


def test_sharded_topk_wide_k_chunked_parity(mesh8, rng):
    """k_local >= 128 (the hybrid depth-4k dense leg on a sharded index)
    routes each shard through the chunked XLA matmul + staged block
    selection; results must match the reference merge exactly, including
    pad-row exclusion (231 rows over 8 shards -> 1 pad row)."""
    import jax.numpy as jnp

    from semanticsearch_tpu.parallel.sharding import (
        pad_to_shards, shard_corpus, sharded_topk)

    # k_local = min(shard_rows, k + n_pad) must exceed 128 to engage the
    # wide path, so shard_rows > 128: 1283 rows -> 161/shard, 5 pad rows
    d, k = 32, 140
    n = 8 * 160 + 3
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((6, d)).astype(np.float32)

    padded, valid_n = pad_to_shards(jnp.asarray(corpus), mesh8)
    sharded = shard_corpus(padded, mesh8)
    vals, idx = sharded_topk(
        jnp.asarray(queries), sharded, mesh8, k=k, valid_n=valid_n,
        use_pallas=True, impl="fused", interpret=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx < n).all()
    scores = queries @ corpus.T
    brute = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    for q in range(queries.shape[0]):
        np.testing.assert_array_equal(idx[q], brute[q], err_msg=f"q={q}")
        np.testing.assert_allclose(vals[q], scores[q][brute[q]], rtol=1e-5)
