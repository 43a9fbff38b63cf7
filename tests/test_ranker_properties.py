"""Hybrid-ranker property tests: ordering invariance and labeling bounds."""
import numpy as np

from semanticsearch_tpu.core.config import RankingConfig
from semanticsearch_tpu.index.ranker import QueryGroup, rank_and_filter_groups
from semanticsearch_tpu.index.rrf import rrf_fuse


def _hash_embed(texts):
    out = np.zeros((len(texts), 32), dtype=np.float32)
    for i, t in enumerate(texts):
        r = np.random.default_rng(abs(hash(t)) % (2**32))
        out[i] = r.standard_normal(32)
    return out


def _group(perm=None):
    # Distinct lengths/content per chunk: RRF rank tie-breaking is positional
    # (matching the reference's np.argsort semantics), so order invariance
    # only holds when scores are untied.
    texts = [
        "number " * (i + 1) + f"unique{i} " + "filler " * (10 - i)
        for i in range(10)
    ]
    if perm is not None:
        texts = [texts[p] for p in perm]
    return QueryGroup(
        query_id="q", query_text="number words unique3",
        chunk_ids=[f"c{i}" for i in range(len(texts))],
        chunk_texts=texts,
    )


def test_chunk_order_invariance():
    """Shuffling the candidate order must not change (chunk -> label, score)."""
    rng = np.random.default_rng(3)
    perm = rng.permutation(10)
    out1 = rank_and_filter_groups([_group()], _hash_embed)
    out2 = rank_and_filter_groups([_group(perm)], _hash_embed)
    m1 = {r.chunk_text: (r.label, round(r.rrf_score, 10)) for r in out1}
    m2 = {r.chunk_text: (r.label, round(r.rrf_score, 10)) for r in out2}
    assert m1 == m2


def test_label_fraction_bounds():
    """With default 80/20 percentiles, kept rows are ~40% of the group and
    positives ~20% (reference keep rule)."""
    out = rank_and_filter_groups([_group()], _hash_embed,
                                 RankingConfig(upper_percentile=80,
                                               lower_percentile=20))
    labels = [r.label for r in out]
    assert 2 <= labels.count(1) <= 3
    assert 2 <= labels.count(0) <= 3


def test_rrf_bounds():
    scores = rrf_fuse([np.arange(5.0), np.arange(5.0)[::-1]], k=60)
    # every candidate appears in both lists once: bounds 2/(60+5) .. 2/61
    assert np.all(scores <= 2 / 61) and np.all(scores >= 2 / 65)
