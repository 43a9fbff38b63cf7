"""Corpus index builder: chunk TSV -> embeddings -> persisted shard layout.

No reference analog (the reference re-embeds chunks per query inside worker
processes with an md5 cache, ``Tool/rank_chunks_optimized.py:141-199``); this
is the index-build half of the BASELINE.md north star. Chunks stream from
TSV, the encoder embeds them in large device batches, embeddings land in a
float16 memmap on disk (row-aligned with a chunk-id table), and ``load_index``
restores an HBM-resident ``EmbeddingIndex`` sharded over the mesh.

The on-disk layout is stage-resumable (the reference's TSV-handoff pattern,
kept deliberately — SURVEY.md §5 checkpoint/resume):
    {dir}/embeddings.f16.npy   (N, D) float16 memmap
    {dir}/ids.tsv              chunk_id + query_id/document_id per row
    {dir}/meta.json            {rows, dim, model_config}
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.config import IndexConfig
from ..core.logging import get_logger
from ..data.tsv import batched, read_tsv, write_tsv
from .engine import EmbeddingIndex

logger = get_logger("index")

EMB_FILE = "embeddings.f16.npy"
IDS_FILE = "ids.tsv"
META_FILE = "meta.json"
PROGRESS_FILE = "build.progress.json"


def build_corpus_index(
    chunks_tsv: str,
    encoder,
    output_dir: str,
    text_column: str = "chunk_text",
    batch_size: int = 1024,
    limit: Optional[int] = None,
    resume: bool = False,
) -> Dict:
    """Embed every chunk and persist the shard layout. Returns meta.

    ``resume=True`` makes the long embed stage RESTART-SAFE: an embed
    cursor (``build.progress.json``, committed every 16 batches) records
    how many rows are durably in the f16 memmap; a rerun after a crash
    re-encodes only from the cursor. ``meta.json`` is written LAST and acts
    as the completion marker — a finished build short-circuits entirely.
    The output is byte-identical to an uninterrupted build (encoding is
    deterministic per text).
    """
    os.makedirs(output_dir, exist_ok=True)
    meta_path = os.path.join(output_dir, META_FILE)
    progress_path = os.path.join(output_dir, PROGRESS_FILE)

    # Pass 1: count rows (memmap needs a static shape).
    n_rows = sum(1 for _ in read_tsv(chunks_tsv, limit=limit))
    if n_rows == 0:
        raise ValueError(f"no rows in {chunks_tsv}")
    dim = encoder.cfg.hidden_dim

    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("rows") == n_rows and meta.get("dim") == dim:
            logger.info("index already complete at %s (%d rows); resume "
                        "skips the build", output_dir, n_rows)
            return meta

    emb_path = os.path.join(output_dir, EMB_FILE)
    start_row = 0
    if resume and os.path.exists(progress_path) and os.path.exists(emb_path):
        with open(progress_path) as f:
            prog = json.load(f)
        if prog.get("n_rows") == n_rows and prog.get("dim") == dim:
            start_row = int(prog.get("rows_done", 0))
            logger.info("resuming embed stage at row %d/%d",
                        start_row, n_rows)
    if start_row > 0:
        mm = np.lib.format.open_memmap(emb_path, mode="r+")
        assert mm.shape == (n_rows, dim), (mm.shape, n_rows, dim)
    else:
        mm = np.lib.format.open_memmap(
            emb_path, mode="w+", dtype=np.float16, shape=(n_rows, dim)
        )

    def _commit_progress(rows_done: int) -> None:
        tmp = progress_path + ".tmp"
        mm.flush()
        with open(tmp, "w") as f:
            json.dump({"rows_done": rows_done, "n_rows": n_rows,
                       "dim": dim}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, progress_path)

    # ---- embed stage (the long one; cursor-resumable) ----
    row_idx = 0
    checked_col = False
    for batch in batched(read_tsv(chunks_tsv, limit=limit), batch_size):
        if row_idx + len(batch) <= start_row:
            row_idx += len(batch)
            continue  # durably embedded before the restart
        if not checked_col and batch:
            # fail FAST on a wrong column name: r.get(col, "") would
            # otherwise embed N empty strings and build a silently useless
            # index with no warning
            if text_column not in batch[0]:
                raise KeyError(
                    f"text column {text_column!r} not in {chunks_tsv} "
                    f"(columns: {sorted(batch[0])})")
            checked_col = True
        texts = [r.get(text_column, "") for r in batch]
        embs = encoder.encode(texts, batch_size=batch_size)
        mm[row_idx: row_idx + len(batch)] = embs.astype(np.float16)
        row_idx += len(batch)
        if (row_idx // batch_size) % 16 == 0:
            _commit_progress(row_idx)
            logger.info("indexed %d/%d chunks", row_idx, n_rows)
    mm.flush()

    # ---- ids stage (fast streaming pass, no device) ----
    def id_rows() -> Iterator[Dict[str, str]]:
        for i, r in enumerate(read_tsv(chunks_tsv, limit=limit)):
            yield {
                "row": str(i),
                "chunk_id": r.get("chunk_id", str(i)),
                "query_id": r.get("query_id", ""),
                "document_id": r.get("document_id", ""),
            }

    write_tsv(os.path.join(output_dir, IDS_FILE), id_rows(),
              ["row", "chunk_id", "query_id", "document_id"])
    meta = {
        "rows": n_rows,
        "dim": dim,
        "encoder_config": dataclasses.asdict(encoder.cfg),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    if os.path.exists(progress_path):
        os.unlink(progress_path)
    logger.info("index built: %d rows x %d dims at %s", n_rows, dim, output_dir)
    return meta


def load_index(
    index_dir: str,
    mesh=None,
    cfg: IndexConfig = IndexConfig(),
) -> Tuple[EmbeddingIndex, List[str]]:
    """Restore the HBM-resident sharded index + the chunk-id table.

    The f16 memmap streams to device SHARD BY SHARD via
    ``jax.make_array_from_callback`` — host memory peaks at one shard slice,
    never the full-corpus f32 copy (which would be ~15 GB at the 10M-row
    north star). Normalization/dtype-cast runs on device after placement.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import local_mesh

    with open(os.path.join(index_dir, META_FILE)) as f:
        meta = json.load(f)
    n, dim = meta["rows"], meta["dim"]
    emb = np.load(os.path.join(index_dir, EMB_FILE), mmap_mode="r")
    assert emb.shape == (n, dim)
    chunk_ids = [row["chunk_id"] for row in read_tsv(os.path.join(index_dir, IDS_FILE))]

    if mesh is None:
        mesh = local_mesh()
    n_shards = mesh.shape["data"]
    # pad ONLY to the shard count: every global pad row costs +1 of local
    # over-selection in sharded_topk (see engine.build) — the per-shard
    # swizzled layout block-pads itself internally
    step = n_shards
    n_pad = ((n + step - 1) // step) * step
    sharding = NamedSharding(mesh, P("data", None))

    def _shard_slice(index: Tuple[slice, ...]) -> np.ndarray:
        rs = index[0]
        start, stop = rs.start or 0, rs.stop if rs.stop is not None else n_pad
        out = np.zeros((stop - start, dim), np.float16)
        real = max(0, min(stop, n) - start)
        if real > 0:
            out[:real] = emb[start: start + real]
        return out

    raw = jax.make_array_from_callback((n_pad, dim), sharding, _shard_slice)

    @jax.jit
    def _normalize(x):
        x = x.astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)
        return jax.lax.with_sharding_constraint(
            x.astype(jnp.dtype(cfg.dtype)), sharding
        )

    corpus = _normalize(raw)
    index = EmbeddingIndex(corpus, valid_n=n, mesh=mesh, cfg=cfg)
    return index, chunk_ids
