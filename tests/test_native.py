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
        "x" * 500,
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
    # the 500-char token exceeds the native 256-byte token buffer; skip it
    np.testing.assert_array_equal(ids_n[:4], ids_p[:4])
    np.testing.assert_array_equal(mask_n[:4], mask_p[:4])


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
    """Threaded native serve-time top-k == per-query Python get_topk
    (tie and zero-fill rules included); skips when no compiler."""
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


def test_native_lib_abi():
    lib = get_lib()
    assert lib is not None
    from semanticsearch_tpu.native import _ABI_VERSION
    assert lib.semsearch_native_abi_version() == _ABI_VERSION
