"""Native C++ kernels vs their pure-Python references."""
import numpy as np
import pytest

from semanticsearch_tpu.native import (
    bm25_score_batch,
    ensure_built,
    get_lib,
    hash_tokenize_batch,
)

pytestmark = pytest.mark.skipif(
    not ensure_built(), reason="no C++ toolchain to build the native library"
)


def test_native_tokenizer_matches_python():
    from semanticsearch_tpu.models.tokenizer import HashingTokenizer

    texts = [
        "Hello, World!",
        "MiXeD CaSe 123 tokens-with-dashes",
        "",
        "unicode café naïve 東京 text",
        "x" * 500,  # run longer than the 256-byte token cap: both paths
        # hash only the first 256 bytes and drop the rest of the run
        "Kelvin İstanbul",  # KELVIN SIGN / dotted-I: str.lower()
        # would map INTO ascii; both paths must treat them as separators
    ]
    tok = HashingTokenizer(vocab_size=5000, max_len=32)
    ids_n, mask_n = hash_tokenize_batch(texts, 5000, 32, True)
    # pure-python path
    ids_p = np.zeros((len(texts), 32), np.int32)
    mask_p = np.zeros((len(texts), 32), np.int32)
    for i, t in enumerate(texts):
        e = tok.encode(t)[:32]
        ids_p[i, : len(e)] = e
        mask_p[i, : len(e)] = 1
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_bm25_matches_python():
    from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize

    corpus = [
        "the quick brown fox",
        "lazy dogs sleep all day long",
        "fox and dog stories",
        "completely different subject matter",
    ]
    bm = BM25Okapi([tokenize(t) for t in corpus])
    queries = [tokenize("fox dog"), tokenize("sleep day"), ["missing"]]
    # get_scores is pure python; get_scores_batch prefers native
    batch = bm.get_scores_batch(queries)
    for i, q in enumerate(queries):
        np.testing.assert_allclose(batch[i], bm.get_scores(q),
                                   rtol=1e-5, atol=1e-6)


def test_native_bm25_topk_batch_matches_python():
    """Threaded native serve-time top-k (MaxScore-pruned) == per-query
    Python get_topk (tie and zero-fill rules included); skips when no
    compiler."""
    import numpy as np

    from semanticsearch_tpu.index.bm25 import BM25Okapi
    from semanticsearch_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    docs = [
        [vocab[j] for j in rng.integers(0, 300, size=rng.integers(3, 40))]
        for _ in range(800)
    ]
    bm = BM25Okapi(docs)
    queries = [
        [vocab[j] for j in rng.integers(0, 300, size=rng.integers(1, 6))]
        for _ in range(25)
    ]
    # include an all-OOV query (pure zero-fill path) and repeated terms
    queries.append(["zzz_not_in_vocab"])
    queries.append([vocab[0], vocab[0], vocab[1]])
    bi, bs = bm.get_topk_batch(queries, 10, n_threads=2)
    for qi, q in enumerate(queries):
        pi, ps = bm.get_topk(q, 10)
        np.testing.assert_array_equal(bi[qi], pi, err_msg=f"query {qi}")
        np.testing.assert_allclose(bs[qi], ps, rtol=1e-5, atol=1e-5)


def test_native_bm25_maxscore_adversarial():
    """MaxScore pruning exactness under its hard cases: mass score TIES
    (duplicate docs — the threshold boundary is crowded), Zipf stopword
    postings (deep pruning engages), k > matched docs (fill path after
    pruning), and a stopword-only corpus whose epsilon-floored IDF goes
    NEGATIVE (per-query exact fallback)."""
    import numpy as np
    import pytest

    from semanticsearch_tpu.index.bm25 import BM25Okapi
    from semanticsearch_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)

    # --- tie-heavy: every doc duplicated 4x from a 12-word vocab ---
    vocab = [f"t{i}" for i in range(12)]
    base = [
        [vocab[j] for j in rng.integers(0, 12, size=6)] for _ in range(60)
    ]
    docs = [list(d) for d in base for _ in range(4)]
    bm = BM25Okapi(docs)
    queries = [[vocab[j] for j in rng.integers(0, 12, size=3)]
               for _ in range(20)]
    bi, bs = bm.get_topk_batch(queries, 15, n_threads=2, method="maxscore")
    for qi, q in enumerate(queries):
        pi, ps = bm.get_topk(q, 15)
        np.testing.assert_array_equal(bi[qi], pi, err_msg=f"tie query {qi}")
        np.testing.assert_allclose(bs[qi], ps, rtol=1e-5, atol=1e-5)

    # --- Zipf stopwords + k larger than some queries' matched set ---
    nv = 500
    probs = 1.0 / np.arange(1, nv + 1) ** 1.3
    probs /= probs.sum()
    words = [f"z{i}" for i in range(nv)]
    docs2 = [
        [words[t] for t in rng.choice(nv, size=10, p=probs)]
        for _ in range(3000)
    ]
    bm2 = BM25Okapi(docs2)
    queries2 = [[words[t] for t in rng.choice(nv, size=4, p=probs)]
                for _ in range(30)]
    queries2.append([words[nv - 1]])  # rarest word: few matches, fill path
    bi2, bs2 = bm2.get_topk_batch(queries2, 50, n_threads=3, method="maxscore")
    for qi, q in enumerate(queries2):
        pi, ps = bm2.get_topk(q, 50)
        np.testing.assert_array_equal(bi2[qi], pi, err_msg=f"zipf query {qi}")
        np.testing.assert_allclose(bs2[qi], ps, rtol=1e-5, atol=1e-5)

    # --- negative epsilon-floored IDF: every term in >half the docs.
    # The native kernels implement get_topk's SPARSE-path contract (matched
    # docs rank before zero-score fillers even at negative scores), so the
    # expectation is computed directly from that contract rather than via
    # get_topk, whose dense path orders negative scores differently (a
    # documented divergence, index/bm25.py::get_topk docstring).
    docs3 = [["common1", "common2", "common3"][: 2 + (i % 2)]
             for i in range(40)]
    bm3 = BM25Okapi(docs3)
    assert (bm3.idf < 0).any(), "fixture must produce negative idf"
    queries3 = [["common1", "common3"], ["common2"], ["common3", "oov"]]
    bi3, bs3 = bm3.get_topk_batch(queries3, 5, n_threads=2, method="maxscore")
    for qi, q in enumerate(queries3):
        full = bm3.get_scores(q)
        touched = sorted({
            d for tok in q if tok in bm3.vocab
            for d in range(len(docs3)) if tok in docs3[d]
        })
        order = sorted(touched, key=lambda d: (-full[d], d))[:5]
        fill = [d for d in range(len(docs3)) if d not in order]
        expect_idx = (order + fill)[:5]
        expect_sc = [full[d] for d in order] + [0.0] * (5 - len(order))
        np.testing.assert_array_equal(bi3[qi], expect_idx,
                                      err_msg=f"negidf query {qi}")
        np.testing.assert_allclose(bs3[qi], expect_sc[:5], rtol=1e-5,
                                   atol=1e-5, err_msg=f"negidf query {qi}")


def test_native_lib_abi():
    lib = get_lib()
    assert lib is not None
    from semanticsearch_tpu.native import _ABI_VERSION
    assert lib.semsearch_native_abi_version() == _ABI_VERSION
