"""Sharded exact-cosine retrieval engine (the BASELINE.md north star).

There is no analog in the reference — it rescores per-query pandas groups.
This engine holds a corpus embedding matrix HBM-resident and row-sharded over
the mesh's ``data`` axis, and answers query batches with the fused Pallas
matmul+top-k kernel per shard plus an ICI all-gather merge
(``parallel/sharding.py``). Single-device meshes skip the collective.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.config import IndexConfig
from ..core.mesh import local_mesh
from ..ops.topk import (
    swizzle_corpus,
    topk_scores,
    topk_scores_chunked,
    topk_scores_pallas,
    topk_scores_ref,
    topk_scores_twopass,
)
from ..parallel.sharding import (
    _n_row_shards,
    pad_to_shards,
    shard_corpus,
    sharded_topk,
    sharded_topk_2level,
)


@dataclass
class SearchResult:
    scores: np.ndarray   # (Q, k) f32
    indices: np.ndarray  # (Q, k) int32 global corpus row ids


class EmbeddingIndex:
    """Exact top-k index over L2-normalized embeddings.

    Usage:
        idx = EmbeddingIndex.build(embeddings, mesh=mesh, cfg=IndexConfig())
        result = idx.search(query_embeddings, k=10)
    """

    def __init__(
        self,
        corpus: jax.Array,
        valid_n: int,
        mesh: Optional[Mesh],
        cfg: IndexConfig,
    ) -> None:
        self._corpus = corpus
        self._valid_n = valid_n
        self._mesh = mesh
        self.cfg = cfg
        # pass-A layout for the two-pass kernel, built lazily on first
        # single-chip TPU search (one transpose-copy, then reused)
        self._corpus_swizzled: Optional[jax.Array] = None

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        mesh: Optional[Mesh] = None,
        cfg: IndexConfig = IndexConfig(),
        normalize: bool = True,
    ) -> "EmbeddingIndex":
        emb = jnp.asarray(embeddings)
        if normalize:
            norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / jnp.maximum(norm, 1e-9)
        emb = emb.astype(jnp.dtype(cfg.dtype))
        if mesh is None:
            mesh = local_mesh()
        n_shards = _n_row_shards(mesh)
        if n_shards > 1:
            # pad ONLY to the shard count (n_pad < n_shards): every global
            # pad row forces +1 of local over-selection in sharded_topk
            # (zero rows score 0.0 and can displace negative-score real
            # candidates), so block-aligning here would explode k_local.
            # The per-shard swizzled layout pads itself internally.
            emb, valid_n = pad_to_shards(emb, mesh)
            emb = shard_corpus(emb, mesh)
        else:
            valid_n = emb.shape[0]
            emb = jax.device_put(emb)
        return cls(emb, valid_n, mesh, cfg)

    @property
    def size(self) -> int:
        return self._valid_n

    def search(self, queries: np.ndarray, k: Optional[int] = None) -> SearchResult:
        vals, idx = self.search_device(queries, k)
        return SearchResult(np.asarray(vals), np.asarray(idx))

    def search_device(
        self, queries, k: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Dispatch the dense top-k and return DEVICE arrays — no host fetch.

        JAX dispatch is asynchronous, so the caller can run host work (the
        lexical leg's query split / posting traversal, fusion bookkeeping)
        while the device computes, and fetch with ``np.asarray`` only when
        the results are actually needed. ``search`` is this plus the
        blocking fetch. Accepts host or device-resident query embeddings.
        """
        k = self.cfg.top_k if k is None else k  # k=0 is a real request
        q = jnp.asarray(queries).astype(self._corpus.dtype)
        n_shards = _n_row_shards(self._mesh) if self._mesh is not None else 1
        use_pallas = jax.default_backend() == "tpu"
        if n_shards > 1:
            shard_rows = self._corpus.shape[0] // n_shards
            # k_local = k + n_pad must fit the segment kernel's lane width;
            # with pad_to_shards' n_pad < n_shards this holds for any
            # practical k (shard block-alignment is NOT required — the
            # kernel pads internally)
            use_twopass = (
                use_pallas
                and min(shard_rows,
                        k + self._corpus.shape[0] - self._valid_n) < 128
            )
            if use_twopass and self._corpus_swizzled is None:
                from ..parallel.sharding import swizzle_corpus_sharded

                self._corpus_swizzled = swizzle_corpus_sharded(
                    self._corpus, self._mesh, self.cfg.block_rows
                )
            # hybrid ("dcn","data") meshes get the hierarchical merge: DCN
            # carries only per-slice winners, never per-shard candidates
            topk_fn = (
                sharded_topk_2level
                if "dcn" in self._mesh.axis_names else sharded_topk
            )
            vals, idx = topk_fn(
                q, self._corpus, self._mesh, k=k,
                valid_n=self._valid_n, use_pallas=use_pallas,
                impl="twopass" if use_twopass else "fused",
                corpus_swizzled_sharded=(
                    self._corpus_swizzled if use_twopass else None
                ),
                block_n=self.cfg.block_rows,
                seg_split=self.cfg.seg_split,
            )
        elif use_pallas and k < 128:
            if self._corpus_swizzled is None:
                self._corpus_swizzled = swizzle_corpus(
                    self._corpus, self.cfg.block_rows
                )
            vals, idx = topk_scores_twopass(
                q, self._corpus, k=k, block_n=self.cfg.block_rows,
                corpus_swizzled=self._corpus_swizzled,
                seg_split=self.cfg.seg_split,
            )
        elif use_pallas and q.shape[0] <= 8192:
            # the segment kernel supports only k < 128; deeper candidate
            # lists (the hybrid dense leg at depth 4*k) use the
            # column-chunked XLA matmul + staged block selection — at
            # serve-sized query batches it beats the fused kernel's
            # k*128-wide per-tile merges (measured 1M rows, Q=1024, k=160:
            # 249.8 ms vs 528.9 ms, tools/bench_wide_k.py). The score-tile
            # budget shrinks the chunk as Q grows;
            # past ~8k queries the shrunken chunks' select epilogues
            # dominate and the fused kernel wins again.
            vals, idx = topk_scores_chunked(
                q, self._corpus, k=k, valid_n=self._valid_n,
            )
        elif use_pallas:
            # huge query batches at k >= 128: the fused kernel keeps the
            # running top-k in VMEM and never materializes score tiles
            vals, idx = topk_scores_pallas(
                q, self._corpus, k=k,
                block_q=self.cfg.query_batch, block_n=self.cfg.block_rows,
            )
        else:
            vals, idx = topk_scores_ref(q, self._corpus, k=k)
        return vals, idx
