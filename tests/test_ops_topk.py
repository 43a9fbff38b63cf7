"""Fused top-k kernel vs brute-force numpy (recall parity per BASELINE.md)."""
import jax.numpy as jnp
import numpy as np
import pytest

from semanticsearch_tpu.ops.topk import (
    topk_scores_pallas,
    topk_scores_ref,
    topk_scores,
    topk_scores_twopass,
)


def _brute_force(q, c, k):
    scores = q @ c.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("q,n,d,k", [(4, 100, 128, 5), (3, 513, 128, 10)])
def test_topk_ref_matches_bruteforce(rng, q, n, d, k):
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = topk_scores_ref(jnp.asarray(Q), jnp.asarray(C), k=k, block_n=256)
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_pallas_interpret_matches_bruteforce(rng):
    q, n, d, k = 4, 300, 128, 10
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = topk_scores_pallas(
        jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8, block_n=128,
        interpret=True,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


@pytest.mark.parametrize("q,n,d,k,block_n", [
    (4, 300, 128, 10, 128),      # multiple corpus blocks, padding
    (3, 1024, 128, 5, 256),      # exact block multiple
    (9, 77, 128, 10, 128),       # single padded block, q padding
])
def test_topk_twopass_interpret_matches_bruteforce(rng, q, n, d, k, block_n):
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8, block_n=block_n,
        q_chunk=8, interpret=True,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_twopass_negative_scores_padding(rng):
    """Zero pad columns (score 0) must not displace negative-scored true
    top-k via inflated segment maxima — the mask applies before segmax."""
    n, d, k = 77, 64, 10
    base = np.zeros(d, np.float32)
    base[0] = 1.0
    C = base[None, :] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    C[:, 0] = np.abs(C[:, 0]) + 0.2
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    Q = np.zeros((4, d), np.float32)
    Q[:, 0] = -1.0
    assert (Q @ C.T).max() < 0
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8, block_n=128,
        q_chunk=8, interpret=True,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_twopass_single_copy_matches(rng):
    """gather_from_swizzled=True (half-HBM mode for the full-10M-on-one-chip
    case) must return identical results to the two-copy mode."""
    from semanticsearch_tpu.ops.topk import swizzle_corpus

    q, n, d, k, block_n = 5, 300, 128, 10, 128
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    sw = swizzle_corpus(jnp.asarray(C), block_n)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), sw, k=k, block_q=8, block_n=block_n, q_chunk=8,
        interpret=True, gather_from_swizzled=True, valid_n=n,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


@pytest.mark.parametrize("seg_split,block_n", [(2, 256), (2, 512), (4, 512)])
def test_topk_twopass_seg_split_matches_bruteforce(rng, seg_split, block_n):
    """Fine segments (seg_split > 1) must stay exact: same swizzle, finer
    pass-B candidates. Covers n not a multiple of the fine segment size."""
    q, n, d, k = 6, 1111, 128, 10
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8, block_n=block_n,
        q_chunk=8, interpret=True, seg_split=seg_split,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_twopass_seg_split_single_copy_matches(rng):
    """seg_split composed with the single-copy swizzled gather."""
    from semanticsearch_tpu.ops.topk import swizzle_corpus

    q, n, d, k, block_n = 5, 700, 128, 10, 256
    Q = rng.standard_normal((q, d)).astype(np.float32)
    C = rng.standard_normal((n, d)).astype(np.float32)
    sw = swizzle_corpus(jnp.asarray(C), block_n)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), sw, k=k, block_q=8, block_n=block_n, q_chunk=8,
        interpret=True, gather_from_swizzled=True, valid_n=n, seg_split=2,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_topk_twopass_randomized_config_sweep(rng):
    """Seeded fuzz over awkward (n, block_n, seg_split, k, mode) combos —
    every configuration must agree exactly with brute force."""
    from semanticsearch_tpu.ops.topk import swizzle_corpus

    d = 128
    combos = [
        # n, block_n, seg_split, k, single_copy
        (97, 128, 1, 3, False),
        (129, 128, 1, 10, True),
        (255, 256, 2, 7, False),
        (511, 256, 2, 12, True),
        (640, 512, 4, 10, False),
        (1000, 512, 4, 5, True),
        (1024, 512, 2, 31, False),
        (300, 256, 1, 10, True),
    ]
    for n, block_n, seg_split, k, single in combos:
        Q = rng.standard_normal((5, d)).astype(np.float32)
        C = rng.standard_normal((n, d)).astype(np.float32)
        if single:
            sw = swizzle_corpus(jnp.asarray(C), block_n)
            vals, idx = topk_scores_twopass(
                jnp.asarray(Q), sw, k=k, block_q=8, block_n=block_n,
                q_chunk=8, interpret=True, gather_from_swizzled=True,
                valid_n=n, seg_split=seg_split,
            )
        else:
            vals, idx = topk_scores_twopass(
                jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8,
                block_n=block_n, q_chunk=8, interpret=True,
                seg_split=seg_split,
            )
        bv, bi = _brute_force(Q, C, k)
        ctx = f"combo n={n} bn={block_n} split={seg_split} k={k} sc={single}"
        np.testing.assert_array_equal(np.asarray(idx), bi, err_msg=ctx)
        np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4,
                                   atol=1e-4, err_msg=ctx)


def test_topk_dispatch_runs_on_cpu(rng):
    Q = rng.standard_normal((2, 128)).astype(np.float32)
    C = rng.standard_normal((50, 128)).astype(np.float32)
    vals, idx = topk_scores(jnp.asarray(Q), jnp.asarray(C), k=3)
    assert vals.shape == (2, 3) and idx.shape == (2, 3)


def test_topk_handles_k_larger_than_tie_groups(rng):
    # Duplicate rows in the corpus -> tied scores; indices must be unique.
    C = np.repeat(rng.standard_normal((5, 128)).astype(np.float32), 4, axis=0)
    Q = C[:1]
    _, idx = topk_scores_ref(jnp.asarray(Q), jnp.asarray(C), k=8, block_n=8)
    assert len(set(np.asarray(idx)[0].tolist())) == 8


@pytest.mark.parametrize("seg_split", [1, 2, 4])
def test_topk_twopass_mxu_overlap_matches(rng, seg_split):
    """The MXU/VPU-overlap pass-A kernel is bit-identical to the monolithic
    one (same segment maxima, same merge) and exact vs brute force."""
    import numpy as np

    q, n, d, k = 16, 2000, 128, 7
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    block_n = 512
    va, ia = topk_scores_twopass(
        queries, corpus, k=k, block_n=block_n, seg_split=seg_split,
        interpret=True)
    vb, ib = topk_scores_twopass(
        queries, corpus, k=k, block_n=block_n, seg_split=seg_split,
        interpret=True, mxu_overlap=True)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # and exact vs brute force
    ref = np.asarray(queries) @ np.asarray(corpus).T
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(ib), ref_idx)


def test_topk_chunked_matches_ref_wide_k(rng):
    """The wide-k serve path (column-chunked matmul + staged block
    selection) matches topk_scores_ref bit-exactly — values, indices, and
    the lower-id tie policy — across chunk boundaries and a remainder
    tail, at k >= 128 where the segment kernel cannot run."""
    from semanticsearch_tpu.ops.topk import topk_scores_chunked

    q, d, n, k = 5, 64, 3333, 160
    # integer-valued f32: every dot is exactly representable, so scores are
    # identical under ANY accumulation order (gemm tiling differs between
    # the two paths) and equality below is exact, not tolerance-based
    queries = rng.integers(-4, 5, size=(q, d)).astype(np.float32)
    corpus = rng.integers(-4, 5, size=(n, d)).astype(np.float32)
    corpus[: n // 2] = corpus[:1]  # many identical rows -> massive ties
    rv, ri = topk_scores_ref(jnp.asarray(queries), jnp.asarray(corpus), k=k)
    cv, ci = topk_scores_chunked(
        jnp.asarray(queries), jnp.asarray(corpus), k=k, chunk=512)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))


def test_topk_chunked_valid_n_and_k_gt_n(rng):
    """Pad rows past valid_n never surface (even when every real score is
    negative), and k > n pads with NEG_INF like the other paths."""
    from semanticsearch_tpu.ops.topk import NEG_INF, topk_scores_chunked

    q, d, n_real, n_pad = 3, 32, 40, 64
    queries = rng.standard_normal((q, d)).astype(np.float32)
    corpus = np.zeros((n_pad, d), np.float32)
    real = rng.standard_normal((n_real, d)).astype(np.float32)
    corpus[:n_real] = -np.abs(real)  # negative scores vs zero pad rows
    queries = np.abs(queries)
    vals, idx = topk_scores_chunked(
        jnp.asarray(queries), jnp.asarray(corpus), k=50,
        chunk=256, valid_n=n_real)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[:, :n_real] < n_real).all()
    bf_v, bf_i = _brute_force(queries, corpus[:n_real], 40)
    np.testing.assert_allclose(vals[:, :n_real], bf_v, rtol=1e-5)
    assert (vals[:, n_real:] <= NEG_INF).all()


def test_topk_chunked_single_chunk_and_budget(rng):
    """n <= chunk takes the unchunked path; a tiny score budget shrinks the
    chunk without changing results."""
    from semanticsearch_tpu.ops.topk import topk_scores_chunked

    q, d, n, k = 4, 48, 700, 130
    queries = rng.standard_normal((q, d)).astype(np.float32)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    rv, ri = topk_scores_ref(jnp.asarray(queries), jnp.asarray(corpus), k=k)
    one_v, one_i = topk_scores_chunked(
        jnp.asarray(queries), jnp.asarray(corpus), k=k)
    np.testing.assert_array_equal(np.asarray(one_i), np.asarray(ri))
    small_v, small_i = topk_scores_chunked(
        jnp.asarray(queries), jnp.asarray(corpus), k=k,
        score_budget_bytes=4 * 4 * 256)  # chunk -> 256 cols
    np.testing.assert_array_equal(np.asarray(small_i), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(small_v), np.asarray(rv))


# ------------------------------------------------------- int8 pass-A mode

@pytest.mark.parametrize("q,n,d,k,block_n", [
    (8, 512, 128, 10, 256),
    (5, 300, 64, 5, 128),
])
def test_topk_twopass_int8_passa_recall(rng, q, n, d, k, block_n):
    """pass_a_int8: values it returns are EXACT (pass B rescores in f32)
    and at these scales the quantization noise is far below score gaps, so
    the result matches brute force outright. (At corpus scale the mode is
    statistically exact — probe_int8_passa.py measures the margin.)"""
    Q = rng.standard_normal((q, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    C = rng.standard_normal((n, d)).astype(np.float32)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=k, block_q=8, block_n=block_n,
        q_chunk=8, interpret=True, pass_a_int8=True,
    )
    bv, bi = _brute_force(Q, C, k)
    np.testing.assert_array_equal(np.asarray(idx), bi)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)


def test_topk_twopass_int8_passa_prequantized_corpus(rng):
    """Serving path: corpus_swizzled_q8 precomputed once via
    quantize_int8_global(swizzle_corpus(C)) gives identical results to
    on-the-fly quantization."""
    from semanticsearch_tpu.ops.topk import (
        quantize_int8_global, swizzle_corpus,
    )

    Q = rng.standard_normal((6, 64)).astype(np.float32)
    C = rng.standard_normal((400, 64)).astype(np.float32)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    swz = swizzle_corpus(jnp.asarray(C), 128)
    c8, _ = quantize_int8_global(swz)
    v1, i1 = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=7, block_q=8, block_n=128,
        q_chunk=8, interpret=True, pass_a_int8=True,
        corpus_swizzled=swz, corpus_swizzled_q8=c8,
    )
    v2, i2 = topk_scores_twopass(
        jnp.asarray(Q), jnp.asarray(C), k=7, block_q=8, block_n=128,
        q_chunk=8, interpret=True, pass_a_int8=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_topk_twopass_int8_chunked_gather(rng, monkeypatch):
    """ADVICE r4: the chunked (q > _MAX_TWOPASS_Q) path combined with
    gather_from_swizzled + pass_a_int8 crashed — corpus_swizzled stays None
    in single-copy mode (the swizzled layout arrives via ``corpus``), so the
    int8 precompute quantized None. Exercise that exact combination at CPU
    scale by shrinking the chunking threshold."""
    import semanticsearch_tpu.ops.topk as topk_mod
    from semanticsearch_tpu.ops.topk import swizzle_corpus

    monkeypatch.setattr(topk_mod, "_MAX_TWOPASS_Q", 8)
    Q = rng.standard_normal((12, 64)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    C = rng.standard_normal((300, 64)).astype(np.float32)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    swz = swizzle_corpus(jnp.asarray(C), 128)
    vals, idx = topk_scores_twopass(
        jnp.asarray(Q), swz, k=5, block_q=8, block_n=128,
        q_chunk=8, interpret=True, pass_a_int8=True,
        gather_from_swizzled=True, valid_n=C.shape[0],
    )
    bv, bi = _brute_force(Q, C, 5)
    np.testing.assert_array_equal(np.asarray(idx), bi)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-4)
