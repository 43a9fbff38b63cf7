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
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.config import IndexConfig, RankingConfig
from ..core.logging import get_logger
from ..data.tsv import read_tsv
from .bm25 import BM25Okapi, tokenize
from .builder import EMB_FILE, IDS_FILE, META_FILE, load_index
from .engine import EmbeddingIndex

logger = get_logger("query")

BM25_FILE = "bm25.pkl"
TEXTS_FILE = "texts.tsv"


@dataclass
class Hit:
    chunk_id: str
    score: float
    dense_rank: int = 0
    lexical_rank: int = 0


class HybridQueryEngine:
    """Dense + lexical retrieval with RRF candidate fusion."""

    def __init__(
        self,
        index: EmbeddingIndex,
        chunk_ids: List[str],
        encoder,
        bm25: Optional[BM25Okapi] = None,
        cfg: RankingConfig = RankingConfig(),
    ) -> None:
        self.index = index
        self.chunk_ids = chunk_ids
        self.encoder = encoder
        self.bm25 = bm25
        self.cfg = cfg

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
    ) -> "HybridQueryEngine":
        """Embed + persist the dense index AND the BM25 term statistics."""
        from .builder import build_corpus_index

        build_corpus_index(chunks_tsv, encoder, output_dir,
                           text_column=text_column, limit=limit)
        texts = [r.get(text_column, "")
                 for r in read_tsv(chunks_tsv, limit=limit)]
        bm25 = BM25Okapi(
            [tokenize(t) for t in texts],
            k1=rank_cfg.bm25_k1, b=rank_cfg.bm25_b,
            epsilon=rank_cfg.bm25_epsilon,
        )
        with open(os.path.join(output_dir, BM25_FILE), "wb") as f:
            pickle.dump(bm25, f)
        index, chunk_ids = load_index(output_dir, mesh=mesh, cfg=index_cfg)
        return cls(index, chunk_ids, encoder, bm25=bm25, cfg=rank_cfg)

    @classmethod
    def load(
        cls,
        index_dir: str,
        encoder,
        mesh=None,
        index_cfg: IndexConfig = IndexConfig(),
        rank_cfg: RankingConfig = RankingConfig(),
    ) -> "HybridQueryEngine":
        index, chunk_ids = load_index(index_dir, mesh=mesh, cfg=index_cfg)
        bm25 = None
        bm25_path = os.path.join(index_dir, BM25_FILE)
        if os.path.exists(bm25_path):
            with open(bm25_path, "rb") as f:
                bm25 = pickle.load(f)
        return cls(index, chunk_ids, encoder, bm25=bm25, cfg=rank_cfg)

    # ------------------------------------------------------------------ query
    def search(
        self,
        queries: Sequence[str],
        k: int = 10,
        candidates: Optional[int] = None,
        hybrid: bool = True,
    ) -> List[List[Hit]]:
        """Top-k hits per query. ``candidates`` is the per-leg depth before
        fusion (default 4k)."""
        depth = candidates or max(4 * k, 20)
        q_emb = self.encoder.encode(list(queries))
        dense = self.index.search(q_emb, k=min(depth, self.index.size))

        use_bm25 = hybrid and self.bm25 is not None
        if use_bm25:
            # batched native top-k (threaded posting traversal, GIL
            # released); one call for the whole query batch
            bm_depth = min(depth, self.index.size)
            bm_idx, bm_scores = self.bm25.get_topk_batch(
                [tokenize(q) for q in queries], bm_depth,
                n_threads=self.cfg.bm25_threads,
            )

        out: List[List[Hit]] = []
        for qi in range(len(queries)):
            rrf: Dict[int, float] = {}
            dense_rank: Dict[int, int] = {}
            lex_rank: Dict[int, int] = {}
            for rank, row in enumerate(dense.indices[qi], start=1):
                row = int(row)
                rrf[row] = rrf.get(row, 0.0) + 1.0 / (self.cfg.rrf_k + rank)
                dense_rank[row] = rank
            if use_bm25:
                # inverted-index top-depth: per-query cost is the query
                # terms' posting sizes, not the corpus size
                top, scores = bm_idx[qi], bm_scores[qi]
                for rank, (row, sc) in enumerate(zip(top, scores), start=1):
                    if sc <= 0:
                        break
                    row = int(row)
                    rrf[row] = rrf.get(row, 0.0) + 1.0 / (self.cfg.rrf_k + rank)
                    lex_rank[row] = rank
            ranked = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            out.append([
                Hit(
                    chunk_id=self.chunk_ids[row],
                    score=score,
                    dense_rank=dense_rank.get(row, 0),
                    lexical_rank=lex_rank.get(row, 0),
                )
                for row, score in ranked
            ])
        return out
