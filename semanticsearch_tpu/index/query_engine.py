"""Serve-time hybrid query engine: dense top-k + BM25 + RRF over one corpus.

The reference only fuses cosine+BM25 at training-label time inside per-query
pandas groups (``Tool/rank_chunks_optimized.py:201-250``); at serve time it
has no retrieval engine at all. This engine is the serving path: the dense
leg runs the fused Pallas top-k over the HBM-resident (optionally
ICI-sharded) embedding index, the lexical leg scores BM25 over the corpus
term statistics (C++ scorer when built), and candidates merge by
reciprocal-rank fusion with the same k=60 semantics.
"""
from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import IndexConfig, RankingConfig
from ..core.logging import get_logger
from ..data.tsv import read_tsv
from .bm25 import BM25Okapi, tokenize
from .builder import EMB_FILE, IDS_FILE, META_FILE, load_index
from .engine import EmbeddingIndex, SearchResult
from .rrf import rrf_weights

_pack_jit = None


def _pack_scores_indices(vals, idx):
    """One (Q, 2k) int32 device array: f32 scores bitcast into [:, :k].

    Each np.asarray of a device array is a blocking round trip through a
    remote device link, so the serve path fetches ONE packed array per leg
    instead of (scores, indices) separately — the same trick as the device
    BM25 result (index/bm25_tpu.py). Dispatched async right after the
    top-k program, so the pack rides the device queue."""
    global _pack_jit
    if _pack_jit is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def pack(v, i):
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(
                    v.astype(jnp.float32), jnp.int32),
                 i.astype(jnp.int32)], axis=1)

        _pack_jit = pack
    return _pack_jit(vals, idx)


def _unpack_scores_indices(packed: np.ndarray) -> SearchResult:
    k = packed.shape[1] // 2
    return SearchResult(
        np.ascontiguousarray(packed[:, :k]).view(np.float32),
        packed[:, k:].astype(np.int64),
    )

logger = get_logger("query")

BM25_FILE = "bm25.pkl"
TEXTS_FILE = "texts.tsv"
TOKENIZER_FILE = "tokenizer.json"
FUSION_FILE = "fusion.json"
COMMIT_JOURNAL = "compact.commit.json"


def _fsync_path(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def recover_staged_commit(index_dir: str) -> Optional[str]:
    """Crash recovery for :meth:`HybridQueryEngine.compact`'s staged commit.

    The commit protocol: (1) write every new artifact to ``<name>.tmp`` and
    fsync it, (2) durably write the :data:`COMMIT_JOURNAL` listing the
    renames — the commit POINT, (3) rename each tmp over its final name,
    (4) fsync the directory and delete the journal. A crash anywhere leaves
    one of two recoverable states: journal absent → the old artifact set is
    intact (stray tmps are deleted); journal present → every pending rename
    is rolled FORWARD (renames that already happened left no tmp, so the
    roll-forward is idempotent). Called automatically by
    :meth:`HybridQueryEngine.load`.

    Returns "rolled_forward", "rolled_back", or None (clean directory).
    """
    journal_path = os.path.join(index_dir, COMMIT_JOURNAL)
    if os.path.exists(journal_path):
        with open(journal_path) as f:
            pending = json.load(f)["replaces"]
        for tmp, final in pending:
            # journals store basenames (rejoined to the directory being
            # loaded); basename() also renders any legacy full-path
            # journal recoverable from a different cwd
            tmp = os.path.join(index_dir, os.path.basename(tmp))
            final = os.path.join(index_dir, os.path.basename(final))
            if os.path.exists(tmp):
                os.replace(tmp, final)
        _fsync_path(index_dir)
        os.unlink(journal_path)
        _fsync_path(index_dir)
        logger.warning("recovered interrupted compact in %s: rolled the "
                       "staged commit FORWARD (%d artifacts)",
                       index_dir, len(pending))
        return "rolled_forward"
    # device_bm25.* tmps belong to the lexical-matrix cache builder
    # (bm25_tpu.py), which may be writing CONCURRENTLY in a sibling serve
    # process — they are not compact artifacts and must not be swept
    stray = [n for n in os.listdir(index_dir)
             if n.endswith(".tmp") and not n.startswith("device_bm25.")]
    if stray:
        for n in stray:
            os.unlink(os.path.join(index_dir, n))
        logger.warning("recovered interrupted compact in %s: rolled BACK "
                       "(removed %d pre-commit tmp files)",
                       index_dir, len(stray))
        return "rolled_back"
    return None


class _SyncLexHandle:
    """Future-shaped wrapper for the synchronous lexical finish (the
    async-finish=off arm of the serve A/B): .result() runs the blocking
    fetch + cert-post inline on the calling thread."""

    def __init__(self, device_bm25, handle):
        self._device_bm25 = device_bm25
        self._handle = handle

    def result(self):
        return self._device_bm25.finish_topk_batch(self._handle)


@dataclass
class Hit:
    chunk_id: str
    score: float
    dense_rank: int = 0
    lexical_rank: int = 0
    rerank_score: Optional[float] = None


class HybridQueryEngine:
    """Dense + lexical retrieval with RRF candidate fusion."""

    def __init__(
        self,
        index: EmbeddingIndex,
        chunk_ids: List[str],
        encoder,
        bm25: Optional[BM25Okapi] = None,
        cfg: RankingConfig = RankingConfig(),
        texts: Optional[List[str]] = None,
        reranker=None,
    ) -> None:
        self.index = index
        self.chunk_ids = chunk_ids
        self.encoder = encoder
        self.bm25 = bm25
        self.cfg = cfg
        self.texts = texts
        self.reranker = reranker
        # serve-time incremental adds: delta searched next to the main
        # index (index/delta.py); compact() folds it into the persisted
        # layout. Delta global row ids start at the main index size.
        self._delta = None
        self._delta_bm25 = None
        self._index_dir: Optional[str] = None
        # tombstoned global rows (remove_documents): filtered at query time
        # with over-fetch, dropped physically at compact()
        self._dead: set = set()
        # device-resident lexical leg, built lazily on first hybrid search
        # when cfg.lexical_device (index/bm25_tpu.py)
        self._device_bm25 = None
        self._device_bm25_depth = 0
        self._warned_no_bm25 = False
        # single-worker executor for the lexical finish (fetch + native
        # cert-post): the device fetch is a network wait and the C++ post
        # kernel releases the GIL, so running them on a background thread
        # overlaps the lexical host post with THIS thread's other blocking
        # fetches (dense leg, encode upload) — the only concurrency a
        # 1-core serve host has is CPU-work-under-network-wait. One worker:
        # finishes are ordered, stats/fallback counters never race.
        self._lex_executor = None
        # toggle for same-process A/B benching (tunnel throughput varies
        # run to run, so the async-finish win is only measurable in-process)
        self.lexical_async_finish = True
        # lazy chunk_id -> [rows] map for remove_documents
        self._row_index: Optional[Dict[str, List[int]]] = None

    # ------------------------------------------------------------- build/load
    @classmethod
    def build(
        cls,
        chunks_tsv: str,
        encoder,
        output_dir: str,
        mesh=None,
        index_cfg: IndexConfig = IndexConfig(),
        rank_cfg: RankingConfig = RankingConfig(),
        text_column: str = "chunk_text",
        limit: Optional[int] = None,
        resume: bool = False,
    ) -> "HybridQueryEngine":
        """Embed + persist the dense index AND the BM25 term statistics.

        ``resume=True``: restart-safe at stage boundaries — the embed stage
        resumes from its durable cursor (``builder.build_corpus_index``),
        and completed BM25/texts stages (files already present) are skipped.
        """
        from .builder import build_corpus_index

        build_corpus_index(chunks_tsv, encoder, output_dir,
                           text_column=text_column, limit=limit,
                           resume=resume)
        texts = [r.get(text_column, "")
                 for r in read_tsv(chunks_tsv, limit=limit)]
        bm25_path = os.path.join(output_dir, BM25_FILE)
        bm25 = None
        if resume and os.path.exists(bm25_path):
            with open(bm25_path, "rb") as f:
                bm25 = pickle.load(f)
            if (bm25.k1, bm25.b, bm25.epsilon) != (
                    rank_cfg.bm25_k1, rank_cfg.bm25_b,
                    rank_cfg.bm25_epsilon):
                # a resumed build with DIFFERENT BM25 params must not
                # silently serve the stale statistics
                logger.warning(
                    "resume: persisted BM25 stats were built with "
                    "k1=%s b=%s eps=%s but rank_cfg asks k1=%s b=%s "
                    "eps=%s — rebuilding the BM25 stage",
                    bm25.k1, bm25.b, bm25.epsilon, rank_cfg.bm25_k1,
                    rank_cfg.bm25_b, rank_cfg.bm25_epsilon)
                bm25 = None
        if bm25 is None:
            bm25 = BM25Okapi(
                [tokenize(t) for t in texts],
                k1=rank_cfg.bm25_k1, b=rank_cfg.bm25_b,
                epsilon=rank_cfg.bm25_epsilon,
            )
            with open(bm25_path, "wb") as f:
                pickle.dump(bm25, f)
        # persist row-aligned chunk texts: the serve-time reranker needs them
        # (the reference keeps chunk_text in every stage TSV for the same
        # reason, rank_chunks_optimized.py:161-199)
        from ..data.tsv import write_tsv

        # NOTE: the column is named chunk_text because read_tsv
        # canonicalizes every CHUNK_TEXT_KEYS alias (incl. "text") to that
        # key — reading must use the canonical name
        texts_path = os.path.join(output_dir, TEXTS_FILE)
        if not (resume and os.path.exists(texts_path)):
            write_tsv(
                texts_path,
                ({"chunk_text": t} for t in texts), ["chunk_text"],
            )
        # a trained subword tokenizer is part of the index contract: queries
        # must encode with the vocabulary the corpus was embedded under
        if hasattr(encoder.tokenizer, "save"):
            encoder.tokenizer.save(os.path.join(output_dir, TOKENIZER_FILE))
        index, chunk_ids = load_index(output_dir, mesh=mesh, cfg=index_cfg)
        engine = cls(index, chunk_ids, encoder, bm25=bm25, cfg=rank_cfg,
                     texts=texts)
        engine._index_dir = output_dir
        return engine

    @classmethod
    def load(
        cls,
        index_dir: str,
        encoder,
        mesh=None,
        index_cfg: IndexConfig = IndexConfig(),
        rank_cfg: RankingConfig = RankingConfig(),
        reranker_dir: Optional[str] = None,
    ) -> "HybridQueryEngine":
        """``reranker_dir``: a trained checkpoint directory (as written by
        ``CVEvaluator.run_model`` / the ``train`` CLI) enabling the neural
        rerank stage of :meth:`search`."""
        recover_staged_commit(index_dir)  # heal an interrupted compact()
        tok_path = os.path.join(index_dir, TOKENIZER_FILE)
        if os.path.exists(tok_path):
            # the index was built under this trained vocabulary — query
            # encoding must match it, whatever tokenizer the caller's
            # encoder instance carries
            from ..models.subword import SubwordTokenizer

            encoder.tokenizer = SubwordTokenizer.load(tok_path)
        index, chunk_ids = load_index(index_dir, mesh=mesh, cfg=index_cfg)
        bm25 = None
        bm25_path = os.path.join(index_dir, BM25_FILE)
        if os.path.exists(bm25_path):
            with open(bm25_path, "rb") as f:
                bm25 = pickle.load(f)
        texts = None
        texts_path = os.path.join(index_dir, TEXTS_FILE)
        if os.path.exists(texts_path):
            texts = [r.get("chunk_text", "")
                     for r in read_tsv(texts_path)]
        reranker = None
        if reranker_dir:
            from .rerank_service import RerankService

            reranker = RerankService.load(reranker_dir)
        # a persisted tuned fusion alpha (`semsearch tune-fusion --save`)
        # applies unless the caller set one explicitly; absent both, the
        # default None = the reference's unweighted fusion
        fusion_path = os.path.join(index_dir, FUSION_FILE)
        if os.path.exists(fusion_path):
            import dataclasses as _dc

            with open(fusion_path) as f:
                persisted = json.load(f)
            if rank_cfg.fusion_alpha is None:
                rank_cfg = _dc.replace(
                    rank_cfg, fusion_alpha=float(persisted["fusion_alpha"]))
                logger.info("using persisted fusion_alpha=%s from %s",
                            rank_cfg.fusion_alpha, fusion_path)
            # rerank_blend's "unset" sentinel is its default 1.0 (the
            # reference's pure-rescoring semantics); an explicit 1.0 and
            # the default are indistinguishable, like fusion_alpha None
            if rank_cfg.rerank_blend == 1.0 and \
                    persisted.get("rerank_blend") is not None:
                rank_cfg = _dc.replace(
                    rank_cfg,
                    rerank_blend=float(persisted["rerank_blend"]))
                logger.info("using persisted rerank_blend=%s from %s",
                            rank_cfg.rerank_blend, fusion_path)
        engine = cls(index, chunk_ids, encoder, bm25=bm25, cfg=rank_cfg,
                     texts=texts, reranker=reranker)
        engine._index_dir = index_dir
        return engine

    # ------------------------------------------------- incremental updates
    def add_documents(
        self, chunk_ids: Sequence[str], texts: Sequence[str]
    ) -> None:
        """Add documents at serve time WITHOUT rebuilding the index.

        New documents are embedded now and land in a device-resident delta
        buffer searched next to the main index (``index/delta.py``); the
        lexical leg scores them with the main corpus's frozen BM25
        statistics so scores stay comparable. Adds are process-local until
        :meth:`compact` persists them. The reference has no serving path
        and rebuilds artifacts offline per stage; this is the production
        freshness story on top of that contract.
        """
        assert len(chunk_ids) == len(texts)
        if not texts:
            return
        from .delta import DeltaBM25, DeltaIndex

        emb = np.asarray(self.encoder.encode(list(texts)), np.float32)
        if self._delta is None:
            self._delta = DeltaIndex(dim=emb.shape[1])
        self._delta.add(emb)
        if self.bm25 is not None:
            if self._delta_bm25 is None:
                self._delta_bm25 = DeltaBM25(self.bm25)
            self._delta_bm25.add([tokenize(t) for t in texts])
        self.chunk_ids = list(self.chunk_ids) + list(chunk_ids)
        self._row_index = None  # remove_documents' map: rebuild lazily
        if self.texts is not None:
            self.texts = list(self.texts) + list(texts)

    def remove_documents(self, chunk_ids: Sequence[str]) -> int:
        """Tombstone documents by chunk id; returns how many matched.

        Removed rows stop appearing in results immediately (query-time
        filter with over-fetch so the top-k stays full while tombstones are
        few); :meth:`compact` drops them physically. Complements
        :meth:`add_documents` for full serve-time freshness.
        """
        # chunk_id -> rows map, built ONCE lazily (invalidated by
        # add_documents/compact): a per-call O(corpus) scan is seconds of
        # host time at the 10M target, blocking the serve thread
        if self._row_index is None:
            ri: Dict[str, List[int]] = {}
            for row, cid in enumerate(self.chunk_ids):
                ri.setdefault(cid, []).append(row)
            self._row_index = ri
        hit = 0
        for cid in set(chunk_ids):
            for row in self._row_index.get(cid, ()):
                if row not in self._dead:
                    self._dead.add(row)
                    hit += 1
        return hit

    def compact(self, output_dir: Optional[str] = None) -> None:
        """Fold delta documents into the persisted index layout and reload.

        Rewrites embeddings.f16.npy / ids.tsv / texts.tsv / bm25.pkl at
        ``output_dir`` (defaults to the directory this engine loaded from)
        with main + delta rows, drops tombstoned rows physically, rebuilds
        the BM25 statistics over the full corpus (un-freezing idf/avgdl),
        and reloads the dense index.
        """
        import json as _json

        from .builder import META_FILE as _META
        from ..data.tsv import write_tsv

        out = output_dir or self._index_dir
        if out is None:
            raise ValueError("no output_dir and engine was not loaded from disk")
        if self.texts is None:
            raise ValueError("compact requires texts (index built without "
                             "texts.tsv)")
        n_delta = self._delta.n if self._delta is not None else 0
        base = self.index.size
        old_emb = np.load(os.path.join(self._index_dir, EMB_FILE),
                          mmap_mode="r") if self._index_dir else None
        if old_emb is None:
            raise ValueError("compact requires the on-disk embedding layout")
        os.makedirs(out, exist_ok=True)
        dim = old_emb.shape[1]
        # live rows survive; tombstones are dropped and rows renumber.
        # Computed as a numpy mask, never a Python int list: at the 10M-row
        # north star a list of int objects costs hundreds of MB on a host
        # doing an ONLINE compaction (ADVICE r2).
        live_mask = np.ones(base + n_delta, dtype=bool)
        if self._dead:
            live_mask[np.fromiter(self._dead, dtype=np.int64)] = False
        live = np.flatnonzero(live_mask)  # ascending int64 row ids
        total = int(live.size)
        mm = np.lib.format.open_memmap(
            os.path.join(out, EMB_FILE) + ".tmp", mode="w+",
            dtype=np.float16, shape=(total, dim),
        )
        # copy CONTIGUOUS live runs as bulk slices (tombstones are sparse;
        # a per-row Python loop would be O(corpus) interpreter iterations
        # at the 10M-row scale). Run boundaries fall where consecutive live
        # ids differ by more than 1 — O(#tombstones + 1) runs total.
        if total:
            breaks = np.flatnonzero(np.diff(live) != 1) + 1
            run_starts_i = np.concatenate([[0], breaks])
            run_ends_i = np.concatenate([breaks, [total]])
            pos = 0
            for si, ei in zip(run_starts_i, run_ends_i):
                run_start = int(live[si])
                run_end = int(live[ei - 1])
                n_run = run_end - run_start + 1
                if run_end < base:
                    mm[pos: pos + n_run] = old_emb[run_start: run_end + 1]
                elif run_start >= base:
                    mm[pos: pos + n_run] = self._delta._host[
                        run_start - base: run_end + 1 - base
                    ].astype(np.float16)
                else:  # run straddles the main/delta boundary
                    n_main = base - run_start
                    mm[pos: pos + n_main] = old_emb[run_start: base]
                    mm[pos + n_main: pos + n_run] = self._delta._host[
                        : run_end + 1 - base
                    ].astype(np.float16)
                pos += n_run
        mm.flush()
        del mm
        # staged commit: every artifact is written to a .tmp first and the
        # renames happen together at the end (the cross-file inconsistency
        # window shrinks to microseconds; each rename itself is atomic)
        replaces = [(os.path.join(out, EMB_FILE) + ".tmp",
                     os.path.join(out, EMB_FILE))]
        live_texts = [self.texts[i] for i in live]

        # preserve the original ids.tsv metadata columns for main rows
        # (streamed — never the whole 10M-row table in host memory); delta
        # rows get empty query/document ids (no provenance)
        def _id_rows():
            old_iter = read_tsv(os.path.join(self._index_dir, IDS_FILE))
            old_row = -1
            old = {}
            for pos, row in enumerate(live):
                while old_row < row:
                    old = next(old_iter, None) or {}
                    old_row += 1
                yield {"row": str(pos), "chunk_id": self.chunk_ids[row],
                       "query_id": old.get("query_id", "") if row < base
                       else "",
                       "document_id": old.get("document_id", "")
                       if row < base else ""}

        ids_tmp = os.path.join(out, IDS_FILE) + ".tmp"
        write_tsv(ids_tmp, _id_rows(),
                  ["row", "chunk_id", "query_id", "document_id"])
        replaces.append((ids_tmp, os.path.join(out, IDS_FILE)))
        texts_tmp = os.path.join(out, TEXTS_FILE) + ".tmp"
        write_tsv(texts_tmp, ({"chunk_text": t} for t in live_texts),
                  ["chunk_text"])
        replaces.append((texts_tmp, os.path.join(out, TEXTS_FILE)))
        meta = {"rows": total, "dim": dim}
        old_meta_path = os.path.join(self._index_dir, _META)
        if os.path.exists(old_meta_path):
            with open(old_meta_path) as f:
                meta = {**_json.load(f), **meta}
        meta_tmp = os.path.join(out, _META) + ".tmp"
        with open(meta_tmp, "w") as f:
            _json.dump(meta, f)
        replaces.append((meta_tmp, os.path.join(out, _META)))
        self.bm25 = BM25Okapi(
            [tokenize(t) for t in live_texts],
            k1=self.cfg.bm25_k1, b=self.cfg.bm25_b,
            epsilon=self.cfg.bm25_epsilon,
        )
        bm_tmp = os.path.join(out, BM25_FILE) + ".tmp"
        with open(bm_tmp, "wb") as f:
            pickle.dump(self.bm25, f)
        replaces.append((bm_tmp, os.path.join(out, BM25_FILE)))
        # Durability: fsync every staged file BEFORE the commit point — a
        # rename can persist ahead of its data on power loss, which would
        # commit a truncated artifact (ADVICE r2). Then write the commit
        # journal (the atomic commit POINT: a crash after it rolls the
        # renames forward at next load, a crash before it rolls back —
        # :func:`recover_staged_commit`), rename, and clean up.
        for tmp, _ in replaces:
            _fsync_path(tmp)
        journal_path = os.path.join(out, COMMIT_JOURNAL)
        journal_tmp = journal_path + ".tmp"  # .tmp: swept by rollback
        with open(journal_tmp, "w") as f:
            # BASENAMES only: the recovering process rejoins them to the
            # directory it is loading, so recovery works from any cwd and
            # after the index directory moves (a cwd-relative path written
            # here would replay relative to the RECOVERING process's cwd)
            json.dump({"replaces": [
                [os.path.basename(t), os.path.basename(fn)]
                for t, fn in replaces
            ]}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(journal_tmp, journal_path)
        _fsync_path(out)
        for tmp, final in replaces:
            os.replace(tmp, final)
        _fsync_path(out)
        os.unlink(journal_path)
        _fsync_path(out)
        self.texts = live_texts
        mesh, idx_cfg = self.index._mesh, self.index.cfg
        # Release the OLD device corpus before loading the compacted one:
        # load_index materializes an (n_pad, dim) f32 normalize transient
        # next to the new resident corpus, and holding the old corpus too
        # would roughly double HBM residency during an ONLINE compaction —
        # at the 10M north-star sizes that OOMs a chip that serves fine in
        # steady state.
        self.index = None
        self.index, self.chunk_ids = load_index(out, mesh=mesh, cfg=idx_cfg)
        self._delta = None
        self._delta_bm25 = None
        self._dead = set()
        self._device_bm25 = None  # stats changed: rebuild on next search
        self._row_index = None
        self._index_dir = out

    # ------------------------------------------------------------------ query
    def search(
        self,
        queries: Sequence[str],
        k: int = 10,
        candidates: Optional[int] = None,
        hybrid: bool = True,
        rerank_top: int = 0,
    ) -> List[List[Hit]]:
        """Top-k hits per query. ``candidates`` is the per-leg depth before
        fusion (default 4k).

        ``rerank_top`` > 0 rescores each query's top-``rerank_top`` RRF
        candidates with the loaded neural reranker (one packed device batch
        for the whole query batch) and reorders that head; the RRF tail keeps
        its order after the head — the shape of the reference pipeline
        (rank_chunks output fed to a trained MatchZoo model). Requires the
        engine to have been loaded with ``reranker_dir`` and the index to
        ship ``texts.tsv``.
        """
        if not len(queries):
            return []
        state = self._dispatch_legs(queries, k, candidates, hybrid)
        return self._finish_legs(state, k, rerank_top)

    def search_pipelined(
        self,
        query_batches: Sequence[Sequence[str]],
        k: int = 10,
        candidates: Optional[int] = None,
        hybrid: bool = True,
        rerank_top: int = 0,
    ) -> List[List[List[Hit]]]:
        """``search`` over a stream of query batches with CROSS-BATCH
        overlap: batch i+1's device programs (encode, dense top-k, delta,
        device BM25) are dispatched BEFORE batch i's results are fetched,
        so batch i's fetch round trips and host fusion run while the chip
        already works on batch i+1. Within-batch overlap (dispatch-then-
        fetch) hides host phases behind the chip; this hides the chip's
        idle gaps between batches behind host work — the two compose.

        Returns one ``search``-shaped result list per input batch. NOT
        concurrency-safe against index mutations (add/remove/compact):
        callers must serialize, as the resident server's dispatcher does.
        """
        out: List[List[List[Hit]]] = []
        prev = None

        def flush():
            nonlocal prev
            if prev is not None:
                out.append(self._finish_legs(prev, k, rerank_top))
                prev = None

        for qb in query_batches:
            if not len(qb):
                flush()  # keep output order aligned with the input batches
                out.append([])
                continue
            state = self._dispatch_legs(qb, k, candidates, hybrid)
            flush()
            prev = state
        flush()
        return out

    def _dispatch_legs(
        self,
        queries: Sequence[str],
        k: int,
        candidates: Optional[int],
        hybrid: bool,
    ) -> Dict:
        """Phase 1 of ``search``: dispatch every device program and run the
        in-flight host leg work; no blocking result fetch happens here
        (the encode/COO uploads block on the transfer itself, as any
        dispatch does). Returns the state ``_finish_legs`` consumes."""
        depth = candidates or max(4 * k, 20)
        # tombstones: over-fetch so the post-filter candidate lists stay
        # full while tombstones are few (exact as long as n_dead fits the
        # over-fetch; compact() resets it to zero). The over-fetch is
        # BUCKETED to 64s: k is jit-static in the dense kernel, so a raw
        # depth+len(dead) would recompile on every tombstone-count change
        fetch = depth
        if self._dead:
            fetch = depth + ((len(self._dead) + 63) // 64) * 64
        # ---- leg dispatch with host/device overlap ----------------------
        # Every device program is dispatched BEFORE any blocking fetch
        # (JAX dispatch is async): encode -> dense top-k -> delta search ->
        # device-BM25, then the lexical host phases (tokenize done up
        # front, rare postings inside start_topk_batch, or the whole host
        # BM25 traversal) run while the chip works, and fetches happen
        # last. Round-3 baseline had the legs fully serialized: the chip
        # sat idle during each leg's host phase (BASELINE.md serve rows).
        use_bm25 = hybrid and self.bm25 is not None
        if hybrid and self.bm25 is None and not self._warned_no_bm25:
            # legitimate for dense-only indexes, but the caller asked for
            # hybrid — say so once instead of silently serving one leg
            logger.warning(
                "hybrid search requested but the index has no BM25 stats "
                "(build with --bm25 / HybridQueryEngine.build); serving "
                "dense-only")
            self._warned_no_bm25 = True
        q_tokens = [tokenize(q) for q in queries] if use_bm25 else None
        # device-resident embeddings when the encoder supports it: the
        # dense leg consumes them directly, skipping a download+re-upload
        # round trip per batch (models/encoder.py::encode_device)
        if hasattr(self.encoder, "encode_device"):
            q_emb = self.encoder.encode_device(list(queries))
        else:
            q_emb = self.encoder.encode(list(queries))
        dense_dev = self.index.search_device(
            q_emb, k=min(fetch, self.index.size))
        dense_packed = _pack_scores_indices(*dense_dev)

        # serve-time adds: search the delta buffer and merge by score (both
        # legs' scores are comparable with the main index — cosine, and
        # frozen-statistics BM25)
        base = self.index.size
        n_delta = self._delta.n if self._delta is not None else 0
        if n_delta:
            delta_vals, delta_idx = self._delta.search(
                q_emb, min(fetch, n_delta)
            )

        lex_handle = None
        if use_bm25:
            bm_depth = min(fetch, self.index.size)
            if self.cfg.lexical_device:
                if (self._device_bm25 is not None
                        and bm_depth > self._device_bm25_depth):
                    # a deeper request than the instance was built for
                    # would cap the candidate pool at the old K' and
                    # silently degrade every query to the host fallback
                    # (exact but ~10x slower) — rebuild with the larger K'
                    logger.info(
                        "device BM25 rebuilt for depth %d (was %d)",
                        bm_depth, self._device_bm25_depth)
                    self._device_bm25 = None
                if self._device_bm25 is None:
                    from .bm25_tpu import DeviceBM25

                    self._device_bm25_depth = max(
                        self.cfg.lexical_topk_device, bm_depth)
                    self._device_bm25 = DeviceBM25(
                        self.bm25,
                        n_dense_terms=self.cfg.lexical_dense_terms,
                        topk_device=max(self.cfg.lexical_topk_device,
                                        bm_depth),
                        residual=self.cfg.lexical_residual,
                        weights=self.cfg.lexical_weights,
                        cache_dir=(self._index_dir
                                   if self.cfg.lexical_cache else None),
                        # same mesh as the dense index: the int8 matrix
                        # column-shards across chips (5 GB/chip at the 10M
                        # north star) instead of OOMing one chip's HBM
                        mesh=self.index._mesh,
                    )
                # exact MXU-path top-k (certified vs the host kernel);
                # dispatch now, then hand the finish (blocking device fetch
                # + GIL-releasing native cert-post + any host fallbacks) to
                # the background worker so it overlaps this thread's other
                # leg fetches; _leg_lists joins the future
                handle = self._device_bm25.start_topk_batch(
                    q_tokens, bm_depth)
                if self.lexical_async_finish:
                    if self._lex_executor is None:
                        from concurrent.futures import ThreadPoolExecutor

                        self._lex_executor = ThreadPoolExecutor(
                            max_workers=1, thread_name_prefix="lex-finish")
                    lex_handle = self._lex_executor.submit(
                        self._device_bm25.finish_topk_batch, handle)
                else:
                    lex_handle = _SyncLexHandle(self._device_bm25, handle)
            else:
                # batched native top-k (threaded posting traversal, GIL
                # released); one call for the whole query batch — runs
                # while the device computes the dispatched dense leg
                bm_idx, bm_scores = self.bm25.get_topk_batch(
                    q_tokens, bm_depth,
                    n_threads=self.cfg.resolved_bm25_threads(),
                )
            delta_lex = (
                self._delta_bm25.score(q_tokens)
                if n_delta and self._delta_bm25 is not None else None
            )

        return {
            "queries": queries,
            "depth": depth,
            "use_bm25": use_bm25,
            "base": base,
            "n_delta": n_delta,
            "dense_packed": dense_packed,
            "delta": (delta_vals, delta_idx) if n_delta else None,
            "lex_handle": lex_handle,
            "bm_host": (None if (not use_bm25 or lex_handle is not None)
                        else (bm_idx, bm_scores)),
            "delta_lex": delta_lex if use_bm25 else None,
        }

    def _leg_lists(
        self, state: Dict
    ) -> Tuple[List[List[Tuple[float, int]]],
               Optional[List[List[Tuple[float, int]]]]]:
        """Fetch both legs' results and build per-query (score, row) lists,
        delta-merged, tombstone-filtered, truncated to the search depth and
        sorted by descending score. Second element is None for dense-only
        searches. Shared by ``_finish_legs`` and ``tune_fusion``."""
        queries = state["queries"]
        depth = state["depth"]
        use_bm25 = state["use_bm25"]
        base = state["base"]
        n_delta = state["n_delta"]
        lex_handle = state["lex_handle"]
        delta_lex = state["delta_lex"]
        if n_delta:
            delta_vals, delta_idx = state["delta"]

        dense = _unpack_scores_indices(np.asarray(state["dense_packed"]))
        if lex_handle is not None:
            # the lexical finish has been running on the background worker
            # since dispatch — by now it overlapped the dense fetch above
            # (and, pipelined, the previous batch's fusion); join it
            bm_idx, bm_scores = lex_handle.result()
        elif state["bm_host"] is not None:
            bm_idx, bm_scores = state["bm_host"]

        dense_lists: List[List[Tuple[float, int]]] = []
        lex_lists: Optional[List[List[Tuple[float, int]]]] = (
            [] if use_bm25 else None)
        for qi in range(len(queries)):
            dense_list = [
                (float(dense.scores[qi][r]), int(dense.indices[qi][r]))
                for r in range(len(dense.indices[qi]))
            ]
            if n_delta:
                # entries beyond the delta's live count come back at
                # NEG_INF (fixed-k search, index/delta.py) — drop them
                dense_list += [
                    (float(delta_vals[qi][j]), base + int(delta_idx[qi][j]))
                    for j in range(delta_vals.shape[1])
                    if delta_vals[qi][j] > -1e29
                ]
                dense_list.sort(key=lambda sr: (-sr[0], sr[1]))
            if self._dead:
                dense_list = [sr for sr in dense_list
                              if sr[1] not in self._dead]
            dense_lists.append(dense_list[:depth])
            if use_bm25:
                # inverted-index top-depth: per-query cost is the query
                # terms' posting sizes, not the corpus size
                lex_list = [
                    (float(sc), int(row))
                    for row, sc in zip(bm_idx[qi], bm_scores[qi])
                    if sc > 0
                ]
                if n_delta and delta_lex is not None:
                    lex_list += [
                        (float(delta_lex[qi][j]), base + j)
                        for j in range(n_delta) if delta_lex[qi][j] > 0
                    ]
                    lex_list.sort(key=lambda sr: (-sr[0], sr[1]))
                if self._dead:
                    lex_list = [sr for sr in lex_list
                                if sr[1] not in self._dead]
                lex_lists.append(lex_list[:depth])
        return dense_lists, lex_lists

    def _finish_legs(self, state: Dict, k: int, rerank_top: int
                     ) -> List[List[Hit]]:
        """Phase 2 of ``search``: blocking result fetches, RRF fusion, and
        the optional neural rerank over the fused head."""
        queries = state["queries"]

        if rerank_top > 0:
            if self.reranker is None:
                raise ValueError(
                    "rerank_top > 0 but no reranker loaded "
                    "(pass reranker_dir to HybridQueryEngine.load)"
                )
            if self.texts is None:
                raise ValueError(
                    "rerank_top > 0 but the index has no texts.tsv "
                    "(rebuild the index with HybridQueryEngine.build)"
                )

        dense_lists, lex_lists = self._leg_lists(state)
        # weighted RRF: (1.0, 1.0) at the default fusion_alpha=None —
        # reference-exact unweighted fusion (index/rrf.py::rrf_weights)
        w_dense, w_lex = rrf_weights(self.cfg.fusion_alpha)
        per_query: List[List[Hit]] = []
        rows_per_query: List[List[int]] = []
        for qi in range(len(queries)):
            rrf: Dict[int, float] = {}
            dense_rank: Dict[int, int] = {}
            lex_rank: Dict[int, int] = {}
            for rank, (_, row) in enumerate(dense_lists[qi], start=1):
                rrf[row] = rrf.get(row, 0.0) + w_dense / (self.cfg.rrf_k + rank)
                dense_rank[row] = rank
            if lex_lists is not None:
                for rank, (sc, row) in enumerate(lex_lists[qi], start=1):
                    rrf[row] = rrf.get(row, 0.0) + w_lex / (self.cfg.rrf_k + rank)
                    lex_rank[row] = rank
            keep = max(k, rerank_top)
            ranked = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
            per_query.append([
                Hit(
                    chunk_id=self.chunk_ids[row],
                    score=score,
                    dense_rank=dense_rank.get(row, 0),
                    lexical_rank=lex_rank.get(row, 0),
                )
                for row, score in ranked
            ])
            rows_per_query.append([row for row, _ in ranked])

        if rerank_top > 0:
            # one packed device batch scores every query's head candidates
            cand_texts = [
                [self.texts[row] for row in rows[:rerank_top]]
                for rows in rows_per_query
            ]
            flat_scores = self.reranker.score_pairs(
                [q for q, c in zip(queries, cand_texts) for _ in c],
                [t for c in cand_texts for t in c],
            )
            blend = min(1.0, max(0.0, self.cfg.rerank_blend))
            off = 0
            for qi, hits in enumerate(per_query):
                n_head = len(cand_texts[qi])
                head = hits[:n_head]
                for j, h in enumerate(head):
                    h.rerank_score = float(flat_scores[off + j])
                off += n_head
                if blend >= 1.0:
                    # pure reranker reorder (reference rescoring semantics);
                    # stable sort: ties keep RRF order
                    order = sorted(range(n_head),
                                   key=lambda j: -head[j].rerank_score)
                else:
                    # rank-RRF blend of the reranker order with the fusion
                    # order (head j's fusion rank is j+1 by construction);
                    # scale-free, same discipline as the leg fusion above
                    rr_rank = np.empty(n_head, np.int32)
                    rr_rank[np.argsort(
                        [-h.rerank_score for h in head], kind="stable")] = \
                        np.arange(1, n_head + 1)
                    kk = self.cfg.rrf_k
                    combined = [
                        blend / (kk + rr_rank[j]) + (1.0 - blend) / (kk + j + 1)
                        for j in range(n_head)
                    ]
                    order = sorted(range(n_head),
                                   key=lambda j: (-combined[j], j))
                per_query[qi] = [head[j] for j in order] + hits[n_head:]
        return [hits[:k] for hits in per_query]

    def tune_fusion(
        self,
        queries: Sequence[str],
        relevant_ids: Sequence[Sequence[str]],
        candidates: Optional[int] = None,
        grid: Optional[Sequence[float]] = None,
    ) -> Tuple[float, float, Dict[float, float]]:
        """Grid-search the weighted-RRF mixing alpha on a labeled
        validation split against the LIVE engine legs (one dispatch, every
        alpha re-fuses the fetched rank lists on the host).

        ``relevant_ids[i]`` are the chunk_ids relevant to ``queries[i]``.
        Use queries the ENCODER never trained on: a contrastively-trained
        encoder is near-perfect on its own training queries (measured
        train-split MAP 0.999 at the scale eval), so tuning there
        degenerates to alpha=1.0 instead of the mix that generalizes.
        Returns ``(best_alpha, best_map, {alpha: map})``; MAP counts
        relevant chunks missing from both legs' candidate pools as
        unretrieved (they divide the AP denominator), so alphas are
        compared on the true metric, not a pool-relative one. Ties break
        toward 0.5 — the reference's unweighted fusion — so tuning never
        drifts from parity without a measured win. The engine config is
        frozen; apply the result via ``dataclasses.replace(rank_cfg,
        fusion_alpha=best)``, ``--set ranking.fusion_alpha=<best>``, or
        persist it next to the index (``semsearch tune-fusion --save``
        writes ``fusion.json``; :meth:`load` auto-applies it).
        Beyond-parity (the reference never tunes its fusion,
        ``rank_chunks_optimized.py:225-239``); the validate-on-a-split
        pattern mirrors its reranker epoch selection
        (``train_controller.py:556-560``).
        """
        from ..train.fusion import DEFAULT_GRID

        if len(queries) != len(relevant_ids):
            raise ValueError(
                f"{len(queries)} queries vs {len(relevant_ids)} label rows")
        state = self._dispatch_legs(list(queries), k=10,
                                    candidates=candidates, hybrid=True)
        if not state["use_bm25"]:
            raise ValueError(
                "tune_fusion needs a hybrid index (build with --bm25)")
        dense_lists, lex_lists = self._leg_lists(state)
        id_to_row = {cid: row for row, cid in enumerate(self.chunk_ids)}
        rel_rows = [
            {id_to_row[str(c)] for c in rel if str(c) in id_to_row}
            for rel in relevant_ids
        ]
        table: Dict[float, float] = {}
        for alpha in (grid if grid is not None else DEFAULT_GRID):
            w_dense, w_lex = rrf_weights(float(alpha))
            aps = []
            for qi in range(len(queries)):
                rrf: Dict[int, float] = {}
                for rank, (_, row) in enumerate(dense_lists[qi], start=1):
                    rrf[row] = rrf.get(row, 0.0) + w_dense / (
                        self.cfg.rrf_k + rank)
                for rank, (_, row) in enumerate(lex_lists[qi], start=1):
                    rrf[row] = rrf.get(row, 0.0) + w_lex / (
                        self.cfg.rrf_k + rank)
                ranked = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))
                hits = 0
                ap = 0.0
                for pos, (row, _) in enumerate(ranked, start=1):
                    if row in rel_rows[qi]:
                        hits += 1
                        ap += hits / pos
                aps.append(ap / max(1, len(rel_rows[qi])))
            table[float(alpha)] = float(np.mean(aps)) if aps else 0.0
        best = max(table, key=lambda a: (table[a], -abs(a - 0.5)))
        return best, table[best], table

    def tune_rerank_blend(
        self,
        queries: Sequence[str],
        relevant_ids: Sequence[Sequence[str]],
        rerank_top: int = 20,
        grid: Optional[Sequence[float]] = None,
    ) -> Tuple[float, float, Dict[float, float]]:
        """Grid-search ``RankingConfig.rerank_blend`` on a labeled
        validation split: one engine dispatch + ONE packed reranker scoring
        of every query's fused top-``rerank_top``; every beta re-orders the
        fetched head on the host and is scored as MAP with the same
        missing-relevant discipline as :meth:`tune_fusion`. Fusion uses the
        engine's CURRENT ``cfg.fusion_alpha`` — tune the fusion first, then
        the blend on top of it (``semsearch tune-fusion --rerank-top N``
        does both in order). Ties break toward beta=1.0 — the reference's
        pure-rescoring semantics (``evaluate_models.py:341-350``) — so
        tuning never drifts from parity without a measured win.
        Measured motivation (BASELINE.md §Capstone): when the generator is
        validation-tuned and the encoder pretrained, pure rescoring LOSES
        to the generator, and a small beta is the optimum.
        """
        if self.reranker is None:
            raise ValueError("tune_rerank_blend needs a loaded reranker "
                             "(pass reranker_dir to HybridQueryEngine.load)")
        if self.texts is None:
            raise ValueError("tune_rerank_blend needs the index texts.tsv")
        if len(queries) != len(relevant_ids):
            raise ValueError(
                f"{len(queries)} queries vs {len(relevant_ids)} label rows")
        state = self._dispatch_legs(list(queries), k=rerank_top,
                                    candidates=None,
                                    hybrid=self.bm25 is not None)
        dense_lists, lex_lists = self._leg_lists(state)
        w_dense, w_lex = rrf_weights(self.cfg.fusion_alpha)
        kk = self.cfg.rrf_k
        heads: List[List[int]] = []   # per query: fused rows, fusion order
        tails: List[List[int]] = []
        for qi in range(len(queries)):
            rrf: Dict[int, float] = {}
            for rank, (_, row) in enumerate(dense_lists[qi], start=1):
                rrf[row] = rrf.get(row, 0.0) + w_dense / (kk + rank)
            if lex_lists is not None:
                for rank, (_, row) in enumerate(lex_lists[qi], start=1):
                    rrf[row] = rrf.get(row, 0.0) + w_lex / (kk + rank)
            ranked = [row for row, _ in
                      sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))]
            heads.append(ranked[:rerank_top])
            tails.append(ranked[rerank_top:])
        flat_scores = self.reranker.score_pairs(
            [q for qi, q in enumerate(queries) for _ in heads[qi]],
            [self.texts[row] for qi in range(len(queries))
             for row in heads[qi]],
        )
        id_to_row = {cid: row for row, cid in enumerate(self.chunk_ids)}
        rel_rows = [
            {id_to_row[str(c)] for c in rel if str(c) in id_to_row}
            for rel in relevant_ids
        ]
        table: Dict[float, float] = {}
        # fine 1/16 grid: the measured eval optima land at 0.0625-0.25
        # (BASELINE.md blend table) — a coarser grid misses them; every
        # beta is a host-side reorder of the SAME predictions, so grid
        # resolution is free
        default_grid = tuple(round(i / 16, 4) for i in range(17))
        for beta in (grid if grid is not None else default_grid):
            beta = float(beta)
            aps, off = [], 0
            for qi in range(len(queries)):
                head = heads[qi]
                pred = np.asarray(
                    flat_scores[off: off + len(head)], np.float64)
                off += len(head)
                rr_rank = np.empty(len(head), np.int64)
                rr_rank[np.argsort(-pred, kind="stable")] = \
                    np.arange(1, len(head) + 1)
                combined = [beta / (kk + rr_rank[j]) + (1 - beta) / (kk + j + 1)
                            for j in range(len(head))]
                order = sorted(range(len(head)),
                               key=lambda j: (-combined[j], j))
                full = [head[j] for j in order] + tails[qi]
                hits = 0
                ap = 0.0
                for pos, row in enumerate(full, start=1):
                    if row in rel_rows[qi]:
                        hits += 1
                        ap += hits / pos
                aps.append(ap / max(1, len(rel_rows[qi])))
            table[beta] = float(np.mean(aps)) if aps else 0.0
        best = max(table, key=lambda b: (table[b], -abs(b - 1.0)))
        return best, table[best], table
