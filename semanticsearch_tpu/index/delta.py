"""Serve-time incremental index updates: a growable DELTA searched next to
the immutable main index.

No reference analog (the reference has no serving path; its artifacts are
rebuilt offline per stage). Production freshness needs document ADDS without
an index rebuild, and JAX device arrays are immutable — so new documents land
in a device-resident delta buffer with capacity doubling (recompiles only on
capacity growth, not per add: the valid count is a traced scalar), and every
query searches main + delta and merges by score. ``HybridQueryEngine.compact``
folds the delta into the persisted layout.

The lexical leg scores delta documents with the MAIN corpus's frozen
statistics (idf / avgdl): scores stay comparable across main and delta —
exactly what an IR system wants between compactions — at the cost of new
vocabulary contributing 0 until the next compact (documented behavior).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

NEG_INF = -1e30


class DeltaIndex:
    """Growable exact-cosine index for freshly added documents.

    Embeddings must arrive L2-normalized (``SentenceEncoder.encode`` output).
    The device buffer doubles in capacity as documents arrive; the search is
    one jitted masked matmul + top_k whose compiled signature depends only on
    (capacity, query shape, k).
    """

    def __init__(self, dim: int, init_capacity: int = 1024) -> None:
        self.dim = dim
        self.capacity = init_capacity
        self.n = 0
        self._host = np.zeros((init_capacity, dim), np.float32)
        self._device = None  # lazily uploaded after each add

    def add(self, embeddings: np.ndarray) -> None:
        emb = np.asarray(embeddings, np.float32)
        need = self.n + emb.shape[0]
        if need > self.capacity:
            while self.capacity < need:
                self.capacity *= 2
            grown = np.zeros((self.capacity, self.dim), np.float32)
            grown[: self.n] = self._host[: self.n]
            self._host = grown
        self._host[self.n: need] = emb
        self.n = need
        self._device = None  # re-upload on next search

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _search_jit():
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("k",))
        def run(q, delta, n_valid, k):
            scores = jnp.einsum("qd,nd->qn", q, delta,
                                preferred_element_type=jnp.float32)
            col = jnp.arange(delta.shape[0], dtype=jnp.int32)[None, :]
            # the valid count is TRACED: adds never recompile, only
            # capacity growth / new query shapes do
            scores = jnp.where(col < n_valid, scores, NEG_INF)
            return jax.lax.top_k(scores, k)

        return run

    def search(self, q_emb: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (Q,k''), local indices (Q,k'')) — k'' is k rounded UP to
        a 64-bucket (capped at capacity), NEVER clamped to the live count:
        k is a jit-static argument, so tying it to ``n`` would recompile on
        every add until the buffer fills (minutes per signature on the
        remote TPU). Rows beyond the live count come back at NEG_INF;
        callers drop entries with score <= NEG_INF/2.
        """
        import jax.numpy as jnp

        if self.n == 0:
            q = np.asarray(q_emb)
            return (np.zeros((q.shape[0], 0), np.float32),
                    np.zeros((q.shape[0], 0), np.int64))
        k_static = min(self.capacity, ((k + 63) // 64) * 64)
        if self._device is None:
            self._device = jnp.asarray(self._host)
        vals, idx = self._search_jit()(
            jnp.asarray(q_emb, jnp.float32), self._device, self.n, k_static
        )
        return np.asarray(vals), np.asarray(idx).astype(np.int64)


class DeltaBM25:
    """Frozen-statistics BM25 scoring of delta documents.

    Holds a CSR over the MAIN index's vocabulary (plus an AUXILIARY
    vocabulary for terms the main corpus has never seen) with precomputed
    quotients (main avgdl in the length normalizer); scoring reuses the
    native merge-join kernel
    (``native/semsearch_native.cpp::bm25_score_batch``) when built, with a
    pure-Python fallback.

    Known terms score with the main corpus's frozen IDF — comparable with
    main-index scores. NEW terms get a provisional IDF from their
    delta-document frequency over (main + delta) docs; ``compact`` replaces
    these with exact statistics.
    """

    def __init__(self, main_bm25) -> None:
        self.bm = main_bm25
        self._main_vocab_size = len(main_bm25.vocab)
        self.new_vocab: dict = {}
        self._new_df: List[int] = []
        self._indptr: List[int] = [0]
        self._termids: List[int] = []
        self._quot: List[float] = []

    @property
    def n_docs(self) -> int:
        return len(self._indptr) - 1

    def add(self, docs_tokens: Sequence[Sequence[str]]) -> None:
        bm = self.bm
        base = self._main_vocab_size
        for toks in docs_tokens:
            norm_d = bm.k1 * (
                1.0 - bm.b + bm.b * len(toks) / max(bm.avgdl, 1e-9)
            )
            tf: dict = {}
            for tok in toks:
                tid = bm.vocab.get(tok)
                if tid is None:
                    tid = self.new_vocab.get(tok)
                    if tid is None:
                        tid = base + len(self.new_vocab)
                        self.new_vocab[tok] = tid
                        self._new_df.append(0)
                tf[tid] = tf.get(tid, 0) + 1
            for tid in sorted(tf):
                if tid >= base:
                    self._new_df[tid - base] += 1
                self._termids.append(tid)
                self._quot.append(tf[tid] / (tf[tid] + norm_d))
            self._indptr.append(len(self._termids))

    def _lookup(self, tok: str):
        tid = self.bm.vocab.get(tok)
        return tid if tid is not None else self.new_vocab.get(tok)

    def _full_idf(self) -> np.ndarray:
        """Main frozen IDF extended with provisional new-term IDF
        (rank_bm25 formula over main+delta doc counts, epsilon-floored with
        the MAIN average so floors stay comparable)."""
        bm = self.bm
        if not self.new_vocab:
            return bm.idf.astype(np.float32)
        n_total = bm.n_docs + self.n_docs
        df = np.asarray(self._new_df, np.float64)
        idf_new = np.log(n_total - df + 0.5) - np.log(df + 0.5)
        if bm.idf.size:
            # the PRE-floor mean, same quantity BM25Okapi floors with
            # (post-floor means are inflated on stopword-heavy corpora);
            # old pickled indexes lack the attribute — fall back
            avg = getattr(bm, "avg_idf", None)
            if avg is None:
                avg = float(np.mean(bm.idf))
            floor = float(bm.epsilon) * avg
            idf_new = np.where(idf_new < 0, floor, idf_new)
        return np.concatenate(
            [bm.idf.astype(np.float32), idf_new.astype(np.float32)]
        )

    def score(self, queries_tokens: Sequence[Sequence[str]]) -> np.ndarray:
        """(Q, n_delta) f32 BM25 scores under the main corpus statistics."""
        from collections import Counter

        bm = self.bm
        nq, nd = len(queries_tokens), self.n_docs
        if nq == 0 or nd == 0:
            return np.zeros((nq, nd), np.float32)
        indptr = np.asarray(self._indptr, np.int64)
        # int32: the native scorer's doc_termids contract (_i32p). An int64
        # array here failed its dtype assert on EVERY call, silently
        # degrading delta scoring to the pure-Python triple loop below.
        termids = np.asarray(self._termids, np.int32)
        quot = np.asarray(self._quot, np.float32)
        idf = self._full_idf()
        q_ids: List[int] = []
        q_wts: List[float] = []
        q_indptr = [0]
        for toks in queries_tokens:
            cnt = Counter(
                tid for tid in (self._lookup(t) for t in toks)
                if tid is not None
            )
            for tid in sorted(cnt):
                q_ids.append(tid)
                q_wts.append(float(cnt[tid]))
            q_indptr.append(len(q_ids))
        try:
            from ..native import bm25_score_batch
        except (ImportError, OSError) as exc:
            from .bm25 import _note_native_unavailable

            _note_native_unavailable(exc)
            bm25_score_batch = None
        if bm25_score_batch is not None:
            try:
                native = bm25_score_batch(
                    indptr, termids, quot, idf,
                    np.asarray(q_indptr, np.int64),
                    np.asarray(q_ids, np.int64),
                    np.asarray(q_wts, np.float32), bm.k1,
                )
            except Exception as exc:
                from .bm25 import _warn_native_failure

                _warn_native_failure(exc)
                native = None
            if native is not None:
                return native
        out = np.zeros((nq, nd), np.float32)
        k1p1 = np.float32(bm.k1 + 1.0)
        for qi, toks in enumerate(queries_tokens):
            cnt = Counter(
                tid for tid in (self._lookup(t) for t in toks)
                if tid is not None
            )
            for d in range(nd):
                s, e = indptr[d], indptr[d + 1]
                acc = np.float32(0.0)
                for p in range(s, e):
                    tid = int(termids[p])
                    c = cnt.get(tid)
                    if c:
                        acc += (c * idf[tid]) * k1p1 * quot[p]
                out[qi, d] = acc
        return out
