"""Vectorized BM25 (Okapi) lexical scoring.

In-repo replacement for the ``rank_bm25.BM25Okapi`` dependency the reference
scores with (``Tool/rank_chunks_optimized.py:219-222``): same scoring formula,
same epsilon semantics (negative IDFs are floored to ``epsilon * avg_idf``),
same whitespace/lowercase tokenization at the call site. Tokenization and the
sparse term statistics are host-side work (string processing has no TPU
analog); scoring is a vectorized bag-of-words dot product.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core.logging import get_logger

logger = get_logger("bm25")

# one-time flags so a broken native kernel is loud exactly once instead of
# silently degrading every batch to the orders-of-magnitude-slower Python path
_NATIVE_IMPORT_NOTED = False
_NATIVE_FAIL_WARNED = False


def _note_native_unavailable(exc: BaseException) -> None:
    global _NATIVE_IMPORT_NOTED
    if not _NATIVE_IMPORT_NOTED:
        _NATIVE_IMPORT_NOTED = True
        logger.info("native BM25 kernels unavailable (%s); using Python path",
                    exc)


def _warn_native_failure(exc: BaseException) -> None:
    global _NATIVE_FAIL_WARNED
    if not _NATIVE_FAIL_WARNED:
        _NATIVE_FAIL_WARNED = True
        logger.warning(
            "native BM25 kernel FAILED (%r); falling back to the Python "
            "path — serve throughput will drop by orders of magnitude",
            exc,
        )


def tokenize(text: str) -> List[str]:
    """Reference tokenization: lowercase + whitespace split
    (``rank_chunks_optimized.py:219,221``)."""
    return text.lower().split()


class BM25Okapi:
    """BM25 Okapi over a fixed document collection.

    Parameters match rank_bm25's defaults (k1=1.5, b=0.75) and the reference's
    epsilon=0.25 call (``rank_chunks_optimized.py:220``).
    """

    def __init__(
        self,
        corpus_tokens: Sequence[Sequence[str]],
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.25,
    ) -> None:
        self.k1 = float(k1)
        self.b = float(b)
        self.epsilon = float(epsilon)
        self.n_docs = len(corpus_tokens)
        self.doc_len = np.array([len(d) for d in corpus_tokens], dtype=np.float32)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0

        # Vocabulary + per-doc term frequencies in CSR-ish arrays.
        self.vocab: Dict[str, int] = {}
        indptr = [0]
        indices: List[int] = []
        data: List[int] = []
        df_counter: Dict[int, int] = {}
        for doc in corpus_tokens:
            tf: Dict[int, int] = {}
            for tok in doc:
                tid = self.vocab.setdefault(tok, len(self.vocab))
                tf[tid] = tf.get(tid, 0) + 1
            # sorted term ids per doc: required by the native merge-join scorer
            for tid in sorted(tf):
                indices.append(tid)
                data.append(tf[tid])
                df_counter[tid] = df_counter.get(tid, 0) + 1
            indptr.append(len(indices))
        self._indptr = np.array(indptr, dtype=np.int64)
        # int32 ids: doc and term counts stay far below 2^31, and the
        # memory-bound scoring loops pay 8 B/posting entry (id + f32
        # quotient) instead of 12 — see ROADMAP "int32 doc ids"
        self._indices = np.array(indices, dtype=np.int32)
        self._data = np.array(data, dtype=np.float32)

        # IDF with rank_bm25's epsilon floor: idf = ln((N - df + 0.5)/(df + 0.5));
        # terms with negative idf get epsilon * average_idf.
        n_vocab = len(self.vocab)
        df = np.zeros(n_vocab, dtype=np.float32)
        for tid, cnt in df_counter.items():
            df[tid] = cnt
        idf = np.log(self.n_docs - df + 0.5) - np.log(df + 0.5)
        # the PRE-floor mean (rank_bm25 semantics); kept so DeltaBM25 can
        # floor provisional new-term idf with the identical quantity
        self.avg_idf = float(idf.mean()) if n_vocab else 0.0
        idf = np.where(idf < 0, self.epsilon * self.avg_idf, idf)
        self.idf = idf.astype(np.float32)

    def _norm(self) -> np.ndarray:
        """Per-doc length normalizer k1*(1-b+b*dl/avgdl): (n_docs,) f32."""
        return (
            self.k1
            * (1.0 - self.b + self.b * self.doc_len / max(self.avgdl, 1e-9))
        ).astype(np.float32)

    def _ensure_doc_quot(self) -> None:
        """Doc-major per-entry quotient tf/(tf+norm[d]), precomputed once.

        The BM25 contribution factors as w * idf * (k1+1) * QUOT where QUOT
        depends only on the posting entry — precomputing it removes the
        division from every scoring inner loop (a ~2x win on the host
        kernels; scoring becomes one multiply-add per posting entry).
        """
        if getattr(self, "_doc_quot", None) is not None:
            return
        norm = self._norm()
        doc_of_entry = np.repeat(
            np.arange(self.n_docs, dtype=np.int32), np.diff(self._indptr)
        )
        self._doc_quot = (
            self._data / (self._data + norm[doc_of_entry])
        ).astype(np.float32)

    def __setstate__(self, state):
        self.__dict__.update(state)
        # indexes pickled before the int32-id layout carry int64 arrays;
        # coerce once at load so the native kernels (ABI 9) see int32
        for attr in ("_indices", "_inv_docs"):
            a = getattr(self, attr, None)
            if a is not None and a.dtype != np.int32:
                setattr(self, attr, a.astype(np.int32))

    def __getstate__(self):
        # the top-k scratch accumulator is pure per-process state — keep it
        # out of persisted indexes (40MB at the 10M north star)
        state = dict(self.__dict__)
        state.pop("_acc", None)
        return state

    # -------------------------------------------------- inverted-index top-k
    def _ensure_inverted(self) -> None:
        """Term-major postings (inverted index), built lazily and cached.

        The doc-major CSR is ideal for batch scoring of small candidate
        sets; serve-time top-k over a 10M-chunk corpus must not scan every
        document per query (the reference's rank_bm25 does, and so did the
        round-1 engine). Postings make per-query cost O(sum_t df(t))."""
        if (getattr(self, "_inv_indptr", None) is not None
                and getattr(self, "_inv_ub", None) is not None):
            # _inv_ub checked too: pickled pre-MaxScore indexes carry the
            # postings but not the pruning bounds — rebuild both
            return
        self._ensure_doc_quot()
        doc_of_entry = np.repeat(
            np.arange(self.n_docs, dtype=np.int32), np.diff(self._indptr)
        )
        order = np.argsort(self._indices, kind="stable")
        n_vocab = len(self.vocab)
        counts = np.bincount(self._indices, minlength=n_vocab)
        self._inv_indptr = np.concatenate(
            [[0], np.cumsum(counts)]
        ).astype(np.int64)
        self._inv_docs = doc_of_entry[order]
        self._inv_quot = self._doc_quot[order]
        # Per-term MAX possible score contribution, for optional MaxScore
        # pruning in the native serve kernel. Exact: (idf*(k1+1)) * max
        # (idf>=0) / min (idf<0, possible under the epsilon floor) over the
        # term's posting quotients.
        if self._inv_docs.size:
            starts = self._inv_indptr[:-1]
            hi = np.maximum.reduceat(self._inv_quot, starts)
            lo = np.minimum.reduceat(self._inv_quot, starts)
            base = (self.idf * (self.k1 + 1.0)).astype(np.float32)
            self._inv_ub = np.where(
                self.idf >= 0, base * hi, base * lo
            ).astype(np.float32)
        else:
            self._inv_ub = np.zeros(len(self.vocab), np.float32)

    def get_topk(self, query_tokens: Sequence[str], k: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (indices, scores) by BM25, touching only posting entries of
        the query's terms. Identical scores to :meth:`get_scores`; ties —
        including at the k-th boundary — break to the lower document id,
        exactly matching ``np.argsort(-scores, kind='stable')[:k]`` over the
        full scan whenever matched scores are positive (always true unless
        epsilon-floored IDFs go negative, where matched-negative docs rank
        before zero-score fillers here). Documents sharing no term score 0
        and only appear when fewer than k docs match (lowest ids first)."""
        self._ensure_inverted()
        k = min(k, self.n_docs)
        if self.n_docs == 0 or k == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        # Persistent accumulator: only touched entries are written and reset,
        # so per-query cost is O(sum_t df(t) + touched log touched), not
        # O(n_docs).
        if getattr(self, "_acc", None) is None or self._acc.size != self.n_docs:
            self._acc = np.zeros(self.n_docs, dtype=np.float32)
        acc = self._acc
        touched_parts = []
        total_postings = 0
        # accumulate in sorted-term-id order with the factored contribution
        # ((c*idf)*(k1+1)) * quot — the SAME f32 operation order as
        # get_scores and the native batch kernels, so boundary ties order
        # bit-identically across every path
        cnt = Counter(
            self.vocab[t] for t in query_tokens if t in self.vocab
        )
        for tid, c in sorted(cnt.items()):
            s, e = self._inv_indptr[tid], self._inv_indptr[tid + 1]
            docs = self._inv_docs[s:e]
            acc[docs] += (
                (c * self.idf[tid]) * np.float32(self.k1 + 1.0)
            ) * self._inv_quot[s:e]
            touched_parts.append(docs)
            total_postings += docs.size
        if not touched_parts:
            idx = np.arange(k, dtype=np.int64)
            return idx, np.zeros(k, np.float32)

        if total_postings * 4 < self.n_docs:
            # SPARSE path: selective query — sort only the touched docs
            touched = np.unique(np.concatenate(touched_parts))  # asc ids
            scores_t = acc[touched].copy()
            acc[touched] = 0.0  # reset for the next query
            # stable -score sort over the ascending-id candidates keeps
            # lower ids first within ties
            order_t = np.argsort(-scores_t, kind="stable")[:k]
            idx = touched[order_t].astype(np.int64)
            scores = scores_t[order_t]
            if idx.size < k:
                # fewer matching docs than k: fill with the lowest-id
                # zero-score docs, as a stable full argsort would
                fill = np.setdiff1d(
                    np.arange(k, dtype=np.int64), idx, assume_unique=False
                )[: k - idx.size]
                idx = np.concatenate([idx, fill])
                scores = np.concatenate(
                    [scores, np.zeros(k - scores.size, np.float32)]
                )
            return idx, scores

        # DENSE path: stopword-class query touching much of the corpus —
        # np.unique over the postings would cost more than one linear pass.
        # argpartition + exact boundary-tie repair (lower ids win).
        part = np.argpartition(-acc, k - 1)[:k]
        vk = float(acc[part].min())
        above = np.nonzero(acc > vk)[0]          # ascending ids
        ties = np.nonzero(acc == vk)[0]          # ascending ids
        sel = np.concatenate([above, ties[: k - above.size]])
        order_s = np.argsort(-acc[sel], kind="stable")
        idx = sel[order_s].astype(np.int64)
        scores = acc[sel][order_s].astype(np.float32)
        acc.fill(0.0)
        return idx, scores

    def get_topk_batch(
        self,
        queries_tokens: Sequence[Sequence[str]],
        k: int,
        n_threads: int = 1,
        method: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Serve-time batched top-k: (idx (Q,k) i64, scores (Q,k) f32).

        Uses the native posting-traversal kernels
        (``native/semsearch_native.cpp``) when available — queries
        parallelize across host cores with the GIL released — and falls
        back to per-query :meth:`get_topk`. Bit-identical results to the
        fallback (same scores, tie and fill rules; asserted in
        tests/test_native.py) EXCEPT on corpora whose epsilon-floored IDF
        goes negative: there the native kernels follow get_topk's
        sparse-path ordering (matched docs before zero-score fillers) while
        get_topk itself may take its dense path, which orders negative
        scores after the fillers — the divergence get_topk's own docstring
        documents.

        ``method``: "unpruned" streams every query-term posting (one
        multiply-add per entry on the precomputed quotients); "maxscore"
        adds Turtle-Flood upper-bound pruning; "auto" (default) picks by
        corpus size. MEASURED (tools/bench_bm25.py, Zipf synthetic
        corpora, 1 thread): at <= 1-2M docs maxscore is a wash-to-loss
        (0.5-1.1x — DAAT merge overhead vs short postings), at 10M docs it
        WINS at every k (1.47x k=10, 1.39x k=40, 1.23x k=100 — stopword
        postings are now long enough that skipping them pays), so auto
        switches to maxscore at >= 4M docs.
        """
        k = min(k, self.n_docs)
        nq = len(queries_tokens)
        if nq == 0 or k == 0:
            return np.zeros((nq, k), np.int64), np.zeros((nq, k), np.float32)
        if method == "auto":
            method = "maxscore" if self.n_docs >= 4_000_000 else "unpruned"
        try:
            from ..native import bm25_topk_batch, bm25_topk_maxscore_batch
        except (ImportError, OSError) as exc:
            _note_native_unavailable(exc)
            bm25_topk_batch = None
        if bm25_topk_batch is not None:
            self._ensure_inverted()
            q_ids: List[int] = []
            q_wts: List[float] = []
            q_indptr = [0]
            for toks in queries_tokens:
                cnt = Counter(self.vocab[t] for t in toks if t in self.vocab)
                for tid in sorted(cnt):
                    q_ids.append(tid)
                    q_wts.append(float(cnt[tid]))
                q_indptr.append(len(q_ids))
            common = (
                self._inv_indptr, self._inv_docs, self._inv_quot,
                self.idf.astype(np.float32),
            )
            tail = (
                self.n_docs,
                np.asarray(q_indptr, np.int64), np.asarray(q_ids, np.int64),
                np.asarray(q_wts, np.float32), self.k1, k, n_threads,
            )
            try:
                if method == "maxscore":
                    native = bm25_topk_maxscore_batch(
                        *common, self._inv_ub, *tail
                    )
                else:
                    native = bm25_topk_batch(*common, *tail)
            except Exception as exc:  # e.g. MemoryError at 10M docs
                _warn_native_failure(exc)
                native = None
            if native is not None:
                return native
        idx = np.zeros((nq, k), np.int64)
        scores = np.zeros((nq, k), np.float32)
        for qi, toks in enumerate(queries_tokens):
            idx[qi], scores[qi] = self.get_topk(toks, k)
        return idx, scores

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        """BM25 score of the query against every document: (n_docs,) f32."""
        scores = np.zeros(self.n_docs, dtype=np.float32)
        if not self.n_docs:
            return scores
        qids = [self.vocab[t] for t in query_tokens if t in self.vocab]
        if not qids:
            return scores
        # rank_bm25 accumulates a term's contribution once per query
        # occurrence, so repeated query terms must be weighted by their count.
        cnt = Counter(qids)
        qset = np.array(sorted(cnt), dtype=np.int64)
        qmul = np.array([cnt[t] for t in qset], dtype=np.float32)
        self._ensure_doc_quot()
        k1p1 = np.float32(self.k1 + 1.0)
        for d in range(self.n_docs):
            s, e = self._indptr[d], self._indptr[d + 1]
            ids = self._indices[s:e]
            hit = np.isin(ids, qset)
            if not hit.any():
                continue
            hit_ids = ids[hit]
            w = qmul[np.searchsorted(qset, hit_ids)] * self.idf[hit_ids]
            scores[d] = float(
                np.sum((w * k1p1) * self._doc_quot[s:e][hit])
            )
        return scores

    def get_scores_batch(self, queries_tokens: Sequence[Sequence[str]]) -> np.ndarray:
        """Score a batch of queries: (n_queries, n_docs) f32, dense-vectorized.

        Builds the query term-weight matrix once and scores all documents with
        one sparse pass — the batch analog the reference lacks (it re-runs
        BM25Okapi per query group).
        """
        nq = len(queries_tokens)
        out = np.zeros((nq, self.n_docs), dtype=np.float32)
        if not self.n_docs or not nq:
            return out
        self._ensure_doc_quot()

        # Native merge-join scorer (C++ via ctypes) when available.
        try:
            from ..native import bm25_score_batch
        except (ImportError, OSError) as exc:
            _note_native_unavailable(exc)
            bm25_score_batch = None
        if bm25_score_batch is not None:
            q_ids: List[int] = []
            q_wts: List[float] = []
            q_indptr = [0]
            for toks in queries_tokens:
                cnt = Counter(
                    self.vocab[t] for t in toks if t in self.vocab
                )
                for tid in sorted(cnt):
                    q_ids.append(tid)
                    q_wts.append(float(cnt[tid]))
                q_indptr.append(len(q_ids))
            try:
                native = bm25_score_batch(
                    self._indptr, self._indices, self._doc_quot,
                    self.idf.astype(np.float32),
                    np.asarray(q_indptr, np.int64),
                    np.asarray(q_ids, np.int64),
                    np.asarray(q_wts, np.float32), self.k1,
                )
            except Exception as exc:
                _warn_native_failure(exc)
                native = None
            if native is not None:
                return native
        # query term -> list of (query row, occurrence count) pairs;
        # multiplicity matches rank_bm25 (once per query occurrence).
        term_to_rows: Dict[int, List[Tuple[int, float]]] = {}
        for qi, toks in enumerate(queries_tokens):
            for t, c in Counter(toks).items():
                tid = self.vocab.get(t)
                if tid is not None:
                    term_to_rows.setdefault(tid, []).append((qi, float(c)))
        k1p1 = np.float32(self.k1 + 1.0)
        for d in range(self.n_docs):
            s, e = self._indptr[d], self._indptr[d + 1]
            for ids_pos in range(s, e):
                tid = int(self._indices[ids_pos])
                rows = term_to_rows.get(tid)
                if not rows:
                    continue
                contrib = (
                    self.idf[tid] * k1p1 * self._doc_quot[ids_pos]
                )
                for qi, c in rows:
                    out[qi, d] += c * contrib
        return out
