"""Device-resident BM25 top-k: the lexical serve leg on the TPU's MXU.

The reference scores BM25 with rank_bm25 full scans on the host
(``Tool/rank_chunks_optimized.py:219-222``); this build's host C++ posting
kernels (``native/semsearch_native.cpp``) made that ~3000x faster per core —
but a serve host has few cores while every other leg of the query path rides
the chip (BASELINE.md r2: at a 1M-chunk index the BM25 leg is 6.1s/1024
queries on the one-core dev host vs 166ms for the dense leg). This module
moves the DOMINANT share of lexical scoring onto the TPU.

DESIGN — frequency-split exact scoring:

- Build time: the top-``n_dense_terms`` vocabulary terms by document
  frequency become a DENSE int8 contribution matrix ``C`` (B, D):
  ``C[t, d] = round(contrib[t, d] / s_t)`` with per-term scale
  ``s_t = max_d |contrib| / 127``, where ``contrib = idf * (k1+1) * quot``
  is exactly the quantity the host kernels accumulate
  (``index/bm25.py::_ensure_doc_quot``). These are precisely the
  stopword-class terms whose long postings dominate host cost; under Zipf
  they carry ~90%+ of posting mass while the dense layout stays a few GB
  (4 GB at B=4096 over 1M docs; the 10M north star shards document columns
  across chips, 5 GB/chip on v5e-8).
- Query time: per-term scales (and their exact bf16 roundings) FOLD INTO
  THE QUERY WEIGHTS, which upload as a tiny COO and densify on device —
  the frequent part of every score is one bf16 matmul ``S = Wq @ C`` on
  the MXU (Q x B @ B x D) followed by an EXACT two-stage block selection
  (``_block_topk``: per-256-block maxima -> top blocks -> top-K' within;
  a full-row ``lax.top_k`` over 1M columns measured ~1.6x slower). RARE
  query terms (df below the cutoff) keep their short postings on the host
  — per-query cost is a few thousand entries, the regime where posting
  traversal is already cheap.
- EXACTNESS: the int8+bf16 matmul is approximate, but its error is bounded
  per query: ``err_ub = sum_t (0.5 * w_t * s_t + |bf16 rounding of
  w_t*s_t| * 127)``. Per query, the candidate set = device top-K' UNION
  all rare-touched docs; touched docs are EXACT-scored immediately (C++
  binary searches over the inverted index — cheaper than gathering their
  approx scores from the 4 GB device score matrix, and tighter), the best
  remaining candidates are rescored exactly in the same f32 op order as
  ``BM25Okapi.get_topk`` (ties land identically), and a certificate
  checks that no non-candidate can beat the exact k-th score (their true
  score is at most ``v_K' + err_ub``). Certified queries are PROVABLY
  equal to ``BM25Okapi.get_topk`` — same scores, same low-doc-id tie
  policy. Uncertified ones (and degenerate cases: fewer than k positive
  matches, epsilon-floored negative idf, boundary tie plateaus) fall back
  to the host kernel in one batched native call, so the output is ALWAYS
  exact; ``stats`` reports the certificate rate and per-phase timings.

- RESIDUAL PASS (default on): certification failures are expensive (a
  full host top-k each), and at corpus scale they dominated the leg (r3:
  4.5% x ~6 ms ≈ 270 ms of a 630 ms batch). A second int8 matrix holding
  the first quantization's residuals (scale ~s/254) plus an f32->bf16x2
  weight split shrinks ``err_ub`` ~100x, making certification essentially
  always succeed — 3x the MXU work (still tens of ms) for a near-zero
  fallback rate. 2x matrix memory; ``residual=False`` restores the single-
  matrix layout where HBM is binding.

Measured (BASELINE.md): 7,112 QPS exact at a 1M-doc corpus on v5e-1 vs
216 QPS/core for the host C++ kernel (progression from 584 pre-optimization;
the full ladder lives in BASELINE.md); hybrid serve 2,810 QPS end-to-end.
"""
from __future__ import annotations

import json
import os
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core.logging import get_logger
from .bm25 import BM25Okapi

logger = get_logger("bm25_tpu")

_WQ_BUCKETS = (8192, 65536)  # static COO sizes for the sparse Wq upload

# Selection block width: the column-padding contract for the dense matrix
# build (host-side, jax-free import path). Must equal ``ops.topk.SEL_BLOCK``
# — asserted at upload time; kept literal here so building/persisting the
# matrix never imports jax.
_SEL_BLOCK = 256

# Document-column chunk width for the scoring matmul. Scoring a 1M-doc
# corpus in one shot materializes full-width transients next to the
# resident int8 matrix — the (Q, D) f32 score matrix and (residual mode)
# the bf16 operand convert + TWO (Q, D) einsum outputs — which OOMed
# 16 GB HBM at 1M docs in residual mode once the serve path's dense leg
# became HBM-co-resident (leg overlap runs both programs concurrently).
# The chunked path never materializes corpus-width scores at all: each
# (Q, chunk) score tile is top-K'-selected immediately and merged into a
# running (Q, K') candidate set, so peak HBM = int8 matrix + chunk-sized
# scratch (~10.3 GB at 1M docs residual, vs ~16.5 GB one-shot).
# Width is a measured trade: each chunk boundary serializes a
# select+merge against the matmul stream, and at 65536 those epilogues
# were HALF the device time (1M docs int8, Q=1024: 3,700 QPS at 65536 ->
# 5,737 at 262144 -> 5,917 at 524288). 262144 takes nearly all of the win
# at a 1 GB f32 score tile; 524288's extra +3% doubles the tile, which
# does not fit next to the 10.2 GB residual matrix pair at the 10M-corpus
# v5e-8 shard size (1.25M docs/chip).
_SCORE_CHUNK = 262144


def _block_topk(S, kp: int):
    """EXACT top-kp over huge rows — delegates to the shared staged
    selection :func:`semanticsearch_tpu.ops.topk.block_topk` (per-block max
    -> top blocks -> sub-block stage on wide tiles -> narrow exact sort;
    exactness + lower-id tie-policy proof in its docstring). Lazy import:
    this module stays importable without jax for host-only index builds."""
    from ..ops.topk import block_topk

    return block_topk(S, kp)


class DeviceBM25:
    """Exact BM25 top-k with the frequent-term scoring on the TPU.

    ``n_dense_terms``: dense-matrix vocabulary budget B (top df-ranked
    terms). ``topk_device``: K' candidates fetched per query.
    """

    def __init__(
        self,
        bm25: BM25Okapi,
        n_dense_terms: int = 4096,
        topk_device: int = 256,
        query_chunk: int = 1024,
        mesh=None,
        residual: bool = True,
        score_chunk_cols: int | None = None,
        weights: str = "bf16",
        cache_dir: str | None = None,
    ) -> None:
        """``mesh``: a jax Mesh with a ``data`` axis shards C's document
        COLUMNS across chips (5 GB/chip int8 at B=4096 over 10M docs on
        v5e-8); each chip scores + top-K's its shard, candidates merge over
        ICI with one all_gather — the same merge shape as the dense leg
        (parallel/sharding.py::sharded_topk). None = single-device.

        ``residual``: add a SECOND int8 matrix holding the int8 quantization
        residuals (scale ~s/254) and a weight-split matmul pass, shrinking
        the certified error bound ~100x. Rationale: fallback cost is the
        device leg's dominant term at corpus scale (r3: 4.5% uncertified
        queries x ~6 ms/query host top-k ≈ 270 ms of the 630 ms lexical leg
        at 1M docs/1024 queries); the residual pass trades 2 extra MXU
        passes (~tens of ms) + 2x matrix memory for a near-zero fallback
        rate. Disable where HBM is the binding constraint.

        ``score_chunk_cols``: document-column width of one scoring-matmul
        step (default ``_SCORE_CHUNK``); tests shrink it to exercise the
        chunked loop on small corpora.

        ``weights`` (residual mode only): how the f64 folded query weights
        ride the MXU. ``"bf16"`` = f32->bf16x2 head/tail split against C
        plus one bf16 pass against C_lo (three bf16 passes, operands
        convert int8->bf16 in HBM). ``"int8"`` = per-query-scaled int8
        weight split w ~= a_q*hi8 + (a_q/254)*mid8 against C plus c_q*lo8
        against C_lo — three int8 x int8 -> int32 einsums: the MXU's int8
        path runs ~2x the bf16 rate AND skips the int8->bf16 operand
        conversion traffic, with the same ~1e-4-relative weight-split error
        (a_q/508 per-term leftover vs bf16's t*2^-16; int32 accumulation is
        EXACT, so no f32 reassociation term). Error budgets are computed
        from the actual f64 leftovers either way, so certification remains
        a proof.

        ``cache_dir``: persist the built int8 matrix there and reuse it on
        the next construction (fingerprinted against the BM25 stats) — a
        serve restart memmaps the matrix from disk instead of re-quantizing
        the CSR, and uploads straight from the memmap without holding it in
        host RAM. Enable via ``RankingConfig.lexical_cache`` (the engine
        passes its index directory)."""
        self.bm = bm25
        if weights not in ("bf16", "int8"):
            raise ValueError(f"weights must be bf16|int8, got {weights!r}")
        if weights == "int8" and not residual:
            # non-residual error is dominated by C's int8 rounding, so an
            # int8 weight split buys nothing there — reject rather than
            # silently measure the wrong path
            raise ValueError(
                "weights='int8' requires residual=True (the int8 split "
                "replaces the residual mode's three bf16 passes; "
                "non-residual scoring is a single bf16 pass already)")
        self.weights = weights
        self.mesh = mesh
        self.score_chunk_cols = int(score_chunk_cols or _SCORE_CHUNK)
        self.topk_device = max(1, min(int(topk_device), bm25.n_docs))
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            # per-shard top-K' cannot exceed the shard's column count
            n_sh = mesh.shape["data"]
            self.topk_device = min(
                self.topk_device, (bm25.n_docs + n_sh - 1) // n_sh)
        self.query_chunk = int(query_chunk)
        bm25._ensure_inverted()
        n_vocab = len(bm25.vocab)
        self.n_docs = bm25.n_docs
        df = np.diff(bm25._inv_indptr)
        B = max(1, min(int(n_dense_terms), n_vocab))
        # top-B terms by df (ties: lower term id) — the long postings
        order = np.lexsort((np.arange(n_vocab), -df))
        self.dense_terms = np.sort(order[:B]).astype(np.int64)
        self.B = B
        # term id -> dense row (-1 = rare, postings stay on host)
        self.term_row = np.full(n_vocab, -1, np.int64)
        self.term_row[self.dense_terms] = np.arange(B)

        self.residual = bool(residual)
        contrib_base = (bm25.idf * (bm25.k1 + 1.0)).astype(np.float32)
        self.scale = np.zeros(B, np.float32)
        self.scale_lo = np.zeros(B, np.float32)
        # Build DIRECTLY into the final upload layout — [C; C_lo] rows,
        # columns pre-padded to the selection/shard alignment — so host peak
        # RSS is exactly the matrix footprint — and ~ONE ROW when
        # ``cache_dir`` streams the build to a disk-backed memmap below.
        # (A build that materializes C and C_lo separately and then
        # concatenates + pads copies the matrix twice more: ~6x footprint
        # transiently, which at the 10M-doc/B=4096 north star is ~250 GB
        # of host RAM vs 82 GB in-RAM / ~10 MB memmapped.) Zero pad
        # columns are masked at query time (valid_n).
        n_shards = mesh.shape.get("data", 1) if mesh is not None else 1
        col_align = _SEL_BLOCK * (n_shards if n_shards > 1 else 1)
        d_pad = self.n_docs + ((-self.n_docs) % col_align)
        cc_shape = (2 * B if self.residual else B, d_pad)

        CC = self._load_cache(cache_dir, cc_shape) if cache_dir else None
        if CC is None:
            if cache_dir:
                # build STRAIGHT INTO the cache file: the fill is row-major
                # (one term = one contiguous row), so the dirty page working
                # set stays ~one row (d_pad bytes) and the host never holds
                # the matrix in RAM at all — the 10M-doc build fits a
                # laptop-class serve host
                # pid-unique tmp: two processes building concurrently
                # must not truncate each other's live mapping (last
                # publisher wins the final rename, both are correct).
                # Named BEFORE the try: the except unlinks it.
                cc_tmp = (os.path.join(cache_dir, self._CACHE_CC)
                          + f".{os.getpid()}.tmp")
                try:
                    os.makedirs(cache_dir, exist_ok=True)
                    n_bytes = int(cc_shape[0]) * int(cc_shape[1])
                    fd = os.open(cc_tmp,
                                 os.O_CREAT | os.O_RDWR | os.O_TRUNC, 0o644)
                    try:
                        # REAL allocation (not a sparse ftruncate): surfaces
                        # ENOSPC here as a catchable OSError instead of a
                        # SIGBUS on dirty-page writeback mid-fill
                        if hasattr(os, "posix_fallocate"):
                            os.posix_fallocate(fd, 0, n_bytes)
                        else:  # pragma: no cover (non-POSIX)
                            os.ftruncate(fd, n_bytes)
                    finally:
                        os.close(fd)
                    # r+ (NOT w+, which would re-truncate to sparse) over
                    # the preallocated file; fallocate'd bytes read as zero
                    CC = np.memmap(cc_tmp, dtype=np.int8, mode="r+",
                                   shape=cc_shape)
                except OSError as exc:  # cache unusable -> in-RAM build
                    logger.warning("device-BM25 cache dir unusable (%s); "
                                   "building in RAM", exc)
                    try:  # don't leave a partial preallocation behind
                        os.unlink(cc_tmp)
                    except OSError:
                        pass
                    cache_dir = None
                    CC = np.zeros(cc_shape, np.int8)
            else:
                CC = np.zeros(cc_shape, np.int8)
            C = CC[:B]
            C_lo = CC[B:] if self.residual else None
            for row, t in enumerate(self.dense_terms):
                s, e = bm25._inv_indptr[t], bm25._inv_indptr[t + 1]
                contrib = contrib_base[t] * bm25._inv_quot[s:e]
                amax = float(np.max(np.abs(contrib))) if e > s else 0.0
                if amax == 0.0:
                    continue
                sc = amax / 127.0
                self.scale[row] = sc
                q8 = np.clip(np.rint(contrib / sc), -127, 127)
                docs = bm25._inv_docs[s:e]
                C[row, docs] = q8.astype(np.int8)
                if self.residual:
                    # residual of the int8 rounding, quantized again at
                    # ~s/254: |contrib - q8*sc - q8_lo*sc_lo| <= 0.5*sc_lo
                    # (f64 exact)
                    resid = contrib.astype(np.float64) - q8 * float(sc)
                    rmax = float(np.max(np.abs(resid)))
                    if rmax > 0.0:
                        sc_lo = rmax / 127.0
                        self.scale_lo[row] = np.float32(sc_lo)
                        C_lo[row, docs] = np.clip(
                            np.rint(resid / sc_lo), -127, 127
                        ).astype(np.int8)
            if cache_dir:
                CC = self._commit_cache(cache_dir, CC, cc_tmp, cc_shape)
        self._upload(CC)
        self.stats: Dict[str, float] = {
            "queries": 0, "fallbacks": 0,
            "t_split_s": 0.0, "t_dispatch_s": 0.0, "t_rare_s": 0.0,
            "t_device_s": 0.0, "t_post_s": 0.0, "t_fallback_s": 0.0,
        }

    # ---------------------------------------------------------------- cache
    # The int8 matrix derives deterministically from the BM25 statistics,
    # so it can persist next to the index: a serve restart memmaps it from
    # disk instead of re-quantizing the CSR (minutes of single-core work at
    # the 10M north star) — and the upload streams from the memmap, so the
    # matrix never occupies host RSS at all. Three files: CC as raw int8
    # (memmap-loadable), small arrays as npz, and a meta/fingerprint json
    # written LAST (tmp + os.replace), so a crash mid-save never leaves a
    # cache that validates.
    _CACHE_META = "device_bm25.meta.json"
    _CACHE_CC = "device_bm25.cc.int8"
    _CACHE_AUX = "device_bm25.aux.npz"

    def _fingerprint(self, cc_shape) -> Dict:
        bm = self.bm
        return {
            "version": 1,
            "n_docs": int(bm.n_docs),
            "n_vocab": len(bm.vocab),
            "n_postings": int(bm._inv_indptr[-1]),
            "k1": float(bm.k1),
            "b": float(bm.b),
            "B": int(self.B),
            "residual": bool(self.residual),
            "cc_shape": [int(s) for s in cc_shape],
            # cheap content checksums over the stats the matrix is built
            # from (f64 sums are order-stable here: fixed CSR order)
            "idf_sum": float(np.sum(bm.idf, dtype=np.float64)),
            "quot_sum": float(np.sum(bm._inv_quot, dtype=np.float64)),
        }

    def _sweep_dead_tmps(self, cache_dir: str) -> None:
        """Reclaim matrix-sized build tmps left by CRASHED builders (their
        pid is embedded in the name); live siblings' tmps are untouched."""
        if not os.path.isdir("/proc"):  # pragma: no cover (non-Linux)
            return
        prefix = self._CACHE_CC + "."
        try:
            names = os.listdir(cache_dir)
        except OSError:
            return
        for n in names:
            if not (n.startswith(prefix) and n.endswith(".tmp")):
                continue
            pid = n[len(prefix):-4]
            if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
                try:
                    os.unlink(os.path.join(cache_dir, n))
                    logger.info("removed dead builder tmp %s", n)
                except OSError:
                    pass

    def _load_cache(self, cache_dir: str, cc_shape):
        self._sweep_dead_tmps(cache_dir)
        meta_p = os.path.join(cache_dir, self._CACHE_META)
        try:
            with open(meta_p) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return None
        if meta != self._fingerprint(cc_shape):
            logger.info("device-BM25 cache stale (fingerprint mismatch), "
                        "rebuilding")
            return None
        try:
            aux = np.load(os.path.join(cache_dir, self._CACHE_AUX))
            if not np.array_equal(aux["dense_terms"], self.dense_terms):
                return None
            cc = np.memmap(os.path.join(cache_dir, self._CACHE_CC),
                           dtype=np.int8, mode="r", shape=tuple(cc_shape))
        except (OSError, ValueError, KeyError):
            return None
        self.scale = aux["scale"].astype(np.float32)
        self.scale_lo = aux["scale_lo"].astype(np.float32)
        logger.info("device-BM25 matrix loaded from cache (%s, %.2f GB "
                    "memmap)", cache_dir, cc.nbytes / 1e9)
        return cc

    def _commit_cache(self, cache_dir: str, CC, cc_tmp: str, cc_shape):
        """Publish the freshly built matrix (a live r+ memmap on the
        pid-unique tmp file): flush, rename into place, write aux + meta
        (meta LAST), and return a read-only memmap of the published file.
        On ANY failure, return the live build mapping itself — its bytes
        are the correct matrix regardless of what the filesystem did, so
        this process serves correctly and only the cache is lost."""
        cc_p = os.path.join(cache_dir, self._CACHE_CC)
        aux_p = os.path.join(cache_dir, self._CACHE_AUX)
        meta_p = os.path.join(cache_dir, self._CACHE_META)
        try:
            CC.flush()
            # Linux allows renaming a file with live mappings; the build
            # views (C/C_lo) keep the old inode alive until __init__ ends
            os.replace(cc_tmp, cc_p)
            with open(aux_p + ".tmp", "wb") as f:
                np.savez(f, scale=self.scale, scale_lo=self.scale_lo,
                         dense_terms=self.dense_terms)
            os.replace(aux_p + ".tmp", aux_p)
            with open(meta_p + ".tmp", "w") as f:
                json.dump(self._fingerprint(cc_shape), f)
            os.replace(meta_p + ".tmp", meta_p)
            logger.info("device-BM25 matrix cached to %s (%.2f GB)",
                        cache_dir,
                        cc_shape[0] * cc_shape[1] / 1e9)
            return np.memmap(cc_p, dtype=np.int8, mode="r",
                             shape=tuple(cc_shape))
        except OSError as exc:
            # NEVER fall back to a previously published cc file here: its
            # bytes may be a DIFFERENT corpus than self.scale/scale_lo,
            # and the certification proof is unsound with a mismatched
            # matrix. The live mapping is always the right bytes.
            logger.warning("device-BM25 cache commit failed: %s — serving "
                           "from the in-process build mapping", exc)
            try:
                # unlinking a mapped file is safe on Linux (the inode
                # lives until munmap); reclaims the matrix-sized tmp
                os.unlink(cc_tmp)
            except OSError:
                pass
            return CC

    # ------------------------------------------------------------------ jit
    def _upload(self, C: np.ndarray) -> None:
        """Device-resident contribution matrices + the jitted scoring program.

        Residual mode stores ``CC = [C; C_lo]`` (2B, D) and the query COO
        addresses THREE logical weight rows per dense term (parallel/host
        build in ``_dispatch_chunk``): col t in [0, B) is the bf16 head of
        ``w*s`` against ``C``; col B+t is its bf16 TAIL (the f32-to-bf16
        split — two bf16 passes reproduce an f32-weight matmul to ~2^-17
        relative) against ``C``; col 2B+t is ``w*s_lo`` against ``C_lo``.
        The kernel densifies them as W_a (Q, B) and W_b (Q, 2B) and scores
        ``S = W_a @ CC[:B] + W_b @ CC`` — 3B-per-query MXU work vs B
        non-residual."""
        import functools

        import jax
        import jax.numpy as jnp

        from ..ops.topk import SEL_BLOCK

        assert SEL_BLOCK == _SEL_BLOCK, (
            "dense-matrix column padding (built host-side against "
            "_SEL_BLOCK) must match the shared selection's block width"
        )
        n_shards = self.mesh.shape["data"] if self.mesh is not None else 1
        valid_n = self.n_docs
        n_q = self.query_chunk
        n_b = self.B
        residual = self.residual
        int8_w = self.weights == "int8"
        # __init__ built C in the final layout: [head; residual] rows,
        # columns already padded to _SEL_BLOCK * n_shards (zero cols are
        # masked by valid_n below) — no copies here.
        col_align = _SEL_BLOCK * (n_shards if n_shards > 1 else 1)
        assert C.shape[1] % col_align == 0, (C.shape, col_align)

        chunk = max(_SEL_BLOCK, self.score_chunk_cols
                    - self.score_chunk_cols % _SEL_BLOCK)

        def densify(wq):
            # densify the sparse query-weight COO on device: the host
            # uploads ~KBs instead of a Q x B f32 matrix per batch
            # (the remote tunnel made that upload the batch bottleneck).
            # wq is ONE packed (3, P) f32 array — [query row; column; value]
            # — because each device_put is a blocking round trip through the
            # remote relay, so three small uploads cost three RTTs where one
            # costs one. f32 carries the int32 rows/cols (< 2^24) and the
            # host's exact bf16-rounded values losslessly. Out-of-range
            # rows/cols are the pad/routing sentinels -> mode="drop".
            if int8_w:
                # trailing n_q columns carry the per-query scales (a, b, c)
                n_coo = wq.shape[1] - n_q
                qi = wq[0, :n_coo].astype(jnp.int32)
                col = wq[1, :n_coo].astype(jnp.int32)
                v8 = wq[2, :n_coo].astype(jnp.int8)
                scales = wq[:, n_coo:]  # (3, n_q) f32
                col_h = jnp.where(col < n_b, col, n_b)
                col_m = jnp.where((col >= n_b) & (col < 2 * n_b),
                                  col - n_b, n_b)
                col_l = jnp.where(col >= 2 * n_b, col - 2 * n_b, n_b)
                Wz = jnp.zeros((n_q, n_b), jnp.int8)
                W_hi = Wz.at[qi, col_h].add(
                    jnp.where(col < n_b, v8, 0), mode="drop")
                W_mid = Wz.at[qi, col_m].add(
                    jnp.where((col >= n_b) & (col < 2 * n_b), v8, 0),
                    mode="drop")
                W_lo = Wz.at[qi, col_l].add(
                    jnp.where(col >= 2 * n_b, v8, 0), mode="drop")
                return (W_hi, W_mid, W_lo, scales)
            wq_q = wq[0].astype(jnp.int32)
            wq_b = wq[1].astype(jnp.int32)
            wq_v = wq[2].astype(jnp.bfloat16)
            if not residual:
                Wq = jnp.zeros((n_q, n_b), jnp.bfloat16)
                return (Wq.at[wq_q, wq_b].add(wq_v, mode="drop"),)
            col_a = jnp.where(wq_b < n_b, wq_b, n_b)  # head weights
            W_a = jnp.zeros((n_q, n_b), jnp.bfloat16)
            W_a = W_a.at[wq_q, col_a].add(wq_v, mode="drop")
            col_b = jnp.where(wq_b >= n_b, wq_b - n_b, 2 * n_b)
            W_b = jnp.zeros((n_q, 2 * n_b), jnp.bfloat16)
            W_b = W_b.at[wq_q, col_b].add(wq_v, mode="drop")
            return (W_a, W_b)

        def score_cols(W, Cc):
            # one MXU pass over a (rows, cc) column slice -> (Q, cc) f32
            if int8_w:
                # three int8 x int8 -> int32 einsums; operands stay int8 in
                # HBM (no bf16 conversion pass). int32 accumulation is
                # exact: |sum| <= n_terms * 127 * 127 << 2^31
                W_hi, W_mid, W_lo, scales = W
                hi = jnp.einsum("qb,bd->qd", W_hi, Cc[:n_b],
                                preferred_element_type=jnp.int32)
                mid = jnp.einsum("qb,bd->qd", W_mid, Cc[:n_b],
                                 preferred_element_type=jnp.int32)
                lo = jnp.einsum("qb,bd->qd", W_lo, Cc[n_b:],
                                preferred_element_type=jnp.int32)
                return (scales[0][:, None] * hi.astype(jnp.float32)
                        + scales[1][:, None] * mid.astype(jnp.float32)
                        + scales[2][:, None] * lo.astype(jnp.float32))
            Cb = Cc.astype(jnp.bfloat16)
            if not residual:
                return jnp.einsum(
                    "qb,bd->qd", W[0], Cb,
                    preferred_element_type=jnp.float32,
                )
            W_a, W_b = W
            return jnp.einsum(
                "qb,bd->qd", W_a, Cb[:n_b],
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "qb,bd->qd", W_b, Cb,
                preferred_element_type=jnp.float32,
            )

        def select_all(wq, Cl, kp):
            # chunk the scoring over document columns AND select inside the
            # loop: each (Q, chunk) score tile is reduced to its top-kp
            # immediately and merged into a running candidate set, so the
            # corpus-width f32 score matrix never exists (see _SCORE_CHUNK
            # for the HBM accounting). EXACT, including the lower-doc-id
            # tie policy: chunks run in ascending column order and the
            # merge concatenates [running, new] — lax.top_k keeps the
            # FIRST of equal values, i.e. the earlier chunk's (lower) id;
            # within a chunk _block_topk already ties to the lower id.
            W = densify(wq)
            lc = Cl.shape[1]
            if lc <= chunk:
                # kp can exceed the (possibly shard-small) column count:
                # select what exists and pad to the static kp (pad idx lc
                # is out-of-corpus -> masked by valid_n; pad val -inf
                # loses every merge)
                kp2 = min(kp, lc)
                v, i = _block_topk(score_cols(W, Cl), kp2)
                if kp2 < kp:
                    v = jnp.pad(v, ((0, 0), (0, kp - kp2)),
                                constant_values=-jnp.inf)
                    i = jnp.pad(i, ((0, 0), (0, kp - kp2)),
                                constant_values=lc)
                return v, i
            nfull, rem = divmod(lc, chunk)

            def merge(run_v, run_i, new_v, new_i):
                av = jnp.concatenate([run_v, new_v], axis=1)
                ai = jnp.concatenate([run_i, new_i], axis=1)
                mv, sel = jax.lax.top_k(av, kp)
                return mv, jnp.take_along_axis(ai, sel, axis=1)

            def body(i, carry):
                run_v, run_i = carry
                sl = jax.lax.dynamic_slice_in_dim(Cl, i * chunk, chunk,
                                                  axis=1)
                # per-chunk selection width caps at the chunk: with
                # kp >= chunk the chunk's ENTIRE column set is selected,
                # so the running merge still sees every possible top-kp
                # element (exactness preserved)
                cv, ci = _block_topk(score_cols(W, sl), min(kp, chunk))
                return merge(run_v, run_i,
                             cv, (ci + i * chunk).astype(jnp.int32))

            init = (jnp.full((n_q, kp), -jnp.inf, jnp.float32),
                    jnp.zeros((n_q, kp), jnp.int32))
            vals, idx = jax.lax.fori_loop(0, nfull, body, init)
            if rem:
                # the tail holds the HIGHEST column ids -> merged LAST so
                # equal-value ties still resolve to the lower id
                tv, ti = _block_topk(score_cols(W, jax.lax.dynamic_slice_in_dim(
                    Cl, nfull * chunk, rem, axis=1)), min(kp, rem))
                ti = (ti + nfull * chunk).astype(jnp.int32)
                if ti.shape[1] < kp:
                    pad_n = kp - ti.shape[1]
                    tv = jnp.pad(tv, ((0, 0), (0, pad_n)),
                                 constant_values=-jnp.inf)
                    ti = jnp.pad(ti, ((0, 0), (0, pad_n)))
                vals, idx = merge(vals, idx, tv, ti)
            return vals, idx

        if n_shards <= 1:
            self._C = jax.device_put(C)

            @functools.partial(jax.jit, static_argnames=("kp",))
            def run(wq, C, kp):
                vals, idx = select_all(wq, C, kp)
                vals = jnp.where(idx < valid_n, vals, -jnp.inf)
                # ONE (Q, 2K') int32 result — scores bitcast losslessly —
                # so the host fetches one array (one tunnel round trip)
                # instead of two
                return jnp.concatenate(
                    [jax.lax.bitcast_convert_type(vals, jnp.int32),
                     idx.astype(jnp.int32)], axis=1)

            self._run = run
            return

        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        shard_cols = C.shape[1] // n_shards
        self._C = jax.device_put(
            C, NamedSharding(mesh, P(None, "data")))

        @functools.partial(jax.jit, static_argnames=("kp",))
        def run_sharded(wq, C, kp):
            def local(wq, c_local):
                my = jax.lax.axis_index("data")
                base = my * shard_cols
                vals, idx = select_all(wq, c_local, kp)
                gidx = (idx + base).astype(jnp.int32)
                vals = jnp.where(gidx < valid_n, vals, -jnp.inf)
                # candidate merge over ICI: O(shards * Q * K'), not corpus
                av = jax.lax.all_gather(vals, "data")
                ai = jax.lax.all_gather(gidx, "data")
                q_n = vals.shape[0]
                av = jnp.transpose(av, (1, 0, 2)).reshape(q_n, -1)
                ai = jnp.transpose(ai, (1, 0, 2)).reshape(q_n, -1)
                bv, sel = jax.lax.top_k(av, kp)
                bi = jnp.take_along_axis(ai, sel, axis=1)
                # single packed fetch, as in the single-device path
                return jnp.concatenate(
                    [jax.lax.bitcast_convert_type(bv, jnp.int32), bi],
                    axis=1)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(None, "data")),
                out_specs=P(),
                check_vma=False,
            )(wq, C)

        self._run = run_sharded

    # --------------------------------------------------------------- helpers
    def _rare_touched(self, rare_t, rare_w):
        """Exact rare-part scores: (docs asc, scores) touched by rare terms."""
        bm = self.bm
        if not rare_t:
            return (np.zeros(0, np.int32), np.zeros(0, np.float32))
        docs_parts, contrib_parts = [], []
        for t, w in zip(rare_t, rare_w):
            s, e = bm._inv_indptr[t], bm._inv_indptr[t + 1]
            docs_parts.append(bm._inv_docs[s:e])
            contrib_parts.append(
                ((w * bm.idf[t]) * np.float32(bm.k1 + 1.0))
                * bm._inv_quot[s:e]
            )
        docs = np.concatenate(docs_parts)
        contrib = np.concatenate(contrib_parts)
        udocs, inv = np.unique(docs, return_inverse=True)
        acc = np.zeros(udocs.size, np.float32)
        np.add.at(acc, inv, contrib)
        return udocs.astype(np.int32), acc

    def _exact_scores(self, q_tids: np.ndarray, q_w: np.ndarray,
                      docs: np.ndarray) -> np.ndarray:
        """Exact BM25 of one query against chosen docs, accumulated in
        ascending-term order with the same factored f32 ops as
        ``BM25Okapi.get_topk`` — boundary ties order bit-identically."""
        bm = self.bm
        out = np.zeros(docs.size, np.float32)
        k1p1 = np.float32(bm.k1 + 1.0)
        order = np.argsort(q_tids)
        for j in order:
            t = int(q_tids[j])
            s, e = int(bm._inv_indptr[t]), int(bm._inv_indptr[t + 1])
            if s == e:
                continue
            seg = bm._inv_docs[s:e]  # ascending doc ids within a term
            pos = np.searchsorted(seg, docs)
            pos_c = np.minimum(pos, seg.size - 1)
            hit = seg[pos_c] == docs
            hit &= pos < seg.size
            if hit.any():
                out[hit] += ((q_w[j] * bm.idf[t]) * k1p1) \
                    * bm._inv_quot[s:e][pos_c[hit]]
        return out

    # ----------------------------------------------------------------- main
    def get_topk_batch(
        self, queries_tokens: Sequence[Sequence[str]], k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """EXACT batched top-k: (idx (Q,k) i64, scores (Q,k) f32), matching
        ``BM25Okapi.get_topk`` (ties to lower doc id; lowest-id zero-score
        fill when fewer than k docs match — via host fallback)."""
        return self.finish_topk_batch(
            self.start_topk_batch(queries_tokens, k))

    def start_topk_batch(self, queries_tokens: Sequence[Sequence[str]],
                         k: int):
        """Dispatch the device phase of a batched top-k and return a handle.

        Splits queries, uploads the sparse query weights, and dispatches the
        MXU scoring program (async); the rare-term host traversal runs AFTER
        dispatch so it overlaps the device compute. The serve path calls
        this, then overlaps OTHER host work (dense-leg fetch, fusion prep),
        then :meth:`finish_topk_batch`. ``get_topk_batch`` = start + finish.
        """
        k_eff = min(k, self.n_docs)
        nq = len(queries_tokens)
        states = []
        if nq and k_eff:
            for start in range(0, nq, self.query_chunk):
                qs = queries_tokens[start: start + self.query_chunk]
                states.append((start, qs, self._dispatch_chunk(qs, k_eff)))
        return (nq, k_eff, states)

    def finish_topk_batch(self, handle) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch + exact-rescore + certify a :meth:`start_topk_batch` handle."""
        nq, k_eff, states = handle
        idx_out = np.zeros((nq, k_eff), np.int64)
        sc_out = np.zeros((nq, k_eff), np.float32)
        for start, qs, st in states:
            self._finish_chunk(qs, st, k_eff, idx_out[start:], sc_out[start:])
        return idx_out, sc_out

    def _topk_chunk(self, qs, k, idx_out, sc_out) -> None:
        self._finish_chunk(qs, self._dispatch_chunk(qs, k), k,
                           idx_out, sc_out)

    def _dispatch_chunk(self, qs, k):
        """Host query split + sparse weight upload + ASYNC device dispatch +
        rare-posting host traversal, in that order — the traversal runs
        while the MXU scores the frequent part.

        The quantization math is BATCHED numpy over every (query, term)
        entry at once: the original per-query loop ran ~8 tiny-array ops per
        query (~125 ms/1024 queries of pure host time on the serve critical
        path); the flat form is one pass over a few-thousand-entry array.
        The bf16 roundings are elementwise, so the folded weights and error
        budgets are IDENTICAL to the per-query form (f64 error sums land in
        a different order, covered by the existing 1e-5 slack factor)."""
        import time as _time

        import jax.numpy as jnp
        import ml_dtypes

        _t0 = _time.perf_counter()
        bm = self.bm
        Q = len(qs)
        n_b = self.B
        vocab = bm.vocab
        # token -> (query, term, count) triples; dict work stays in Python,
        # everything numeric below is flat numpy
        q_of_l: List[int] = []
        tid_l: List[int] = []
        cnt_l: List[float] = []
        for qi, toks in enumerate(qs):
            cnt = Counter(t for t in toks if t in vocab)
            for tok, c in cnt.items():
                q_of_l.append(qi)
                tid_l.append(vocab[tok])
                cnt_l.append(float(c))
        q_of = np.asarray(q_of_l, np.int64)
        tids = np.asarray(tid_l, np.int64)
        cnts = np.asarray(cnt_l, np.float64)
        rows_all = (self.term_row[tids] if tids.size
                    else np.zeros(0, np.int64))
        dm = rows_all >= 0
        dq = q_of[dm]
        drow = rows_all[dm]
        w64 = cnts[dm]
        # rare entries stay query-grouped (q_of is emitted query-major)
        rq = q_of[~dm]
        r_tids_a = tids[~dm]
        r_w_a = cnts[~dm].astype(np.float32)
        r_indptr_a = np.zeros(Q + 1, np.int64)
        np.add.at(r_indptr_a, rq + 1, 1)
        np.cumsum(r_indptr_a, out=r_indptr_a)

        # fold the int8 scale into the weight: S is directly the approximate
        # frequent-part score. Uploaded SPARSE (COO, bf16-rounded here so
        # the error budget is exact).
        t64 = w64 * self.scale[drow]  # target weight, f64 reference
        err_acc = np.zeros(Q, np.float64)
        scales_blk = None
        if self.weights == "int8":
            # per-query int8 weight split (see __init__): w ~= a*hi8 +
            # (a/254)*mid8; residual weights one int8 at c. Scales are
            # rounded to f32 FIRST so the f64 leftover bookkeeping below
            # uses exactly the values the device multiplies by.
            l64 = w64 * self.scale_lo[drow]
            amax = np.zeros(Q, np.float64)
            cmax = np.zeros(Q, np.float64)
            if dq.size:
                np.maximum.at(amax, dq, np.abs(t64))
                np.maximum.at(cmax, dq, np.abs(l64))
            a = np.where(amax > 0, amax / 127.0, 1.0)
            a = a.astype(np.float32).astype(np.float64)
            b = (a / 254.0).astype(np.float32).astype(np.float64)
            c = np.where(cmax > 0, cmax / 127.0, 1.0)
            c = c.astype(np.float32).astype(np.float64)
            ad, bd, cd = a[dq], b[dq], c[dq]
            w_hi8 = np.clip(np.rint(t64 / ad), -127, 127)
            w_mid8 = np.clip(np.rint((t64 - w_hi8 * ad) / bd), -127, 127)
            left = np.abs(t64 - w_hi8 * ad - w_mid8 * bd)
            w_lo8 = np.clip(np.rint(l64 / cd), -127, 127)
            left_lo = np.abs(l64 - w_lo8 * cd)
            np.add.at(err_acc, dq,
                      0.5 * w64 * self.scale_lo[drow]
                      + (left + left_lo) * 127.0)
            smax_acc = np.zeros(Q, np.float64)
            np.add.at(smax_acc, dq,
                      (np.abs(w_hi8) * ad + np.abs(w_mid8) * bd
                       + np.abs(w_lo8) * cd) * 127.0)
            err_ubs = (err_acc * (1.0 + 1e-5) + smax_acc * 1e-6
                       + 1e-6).astype(np.float32)
            wq_qi = np.concatenate([dq, dq, dq])
            wq_col = np.concatenate([drow, drow + n_b, drow + 2 * n_b])
            wq_val = np.concatenate([w_hi8, w_mid8, w_lo8]).astype(
                np.float32)
            scales_blk = np.zeros((3, self.query_chunk), np.float32)
            scales_blk[0, :Q] = a
            scales_blk[1, :Q] = b
            scales_blk[2, :Q] = c
        elif not self.residual:
            ws_hi = np.asarray(t64.astype(np.float32),
                               ml_dtypes.bfloat16).astype(np.float32)
            # exact error budget of the device result vs true BM25:
            #   int8 rounding: <= 0.5 * s_t per matched term, and
            #   bf16 weight rounding (computed EXACTLY) times |C8|<=127;
            #   plus f32 reassociation slack
            np.add.at(err_acc, dq, 0.5 * t64 + np.abs(t64 - ws_hi) * 127.0)
            err_ubs = (err_acc * (1.0 + 1e-5) + 1e-6).astype(np.float32)
            wq_qi, wq_col, wq_val = dq, drow, ws_hi
        else:
            # residual mode, bf16 weights: split the f32 weight into two
            # bf16 passes (head + tail against C) and add the
            # residual-matrix pass; every rounding leftover is computed
            # EXACTLY in f64
            ws_hi = np.asarray(t64.astype(np.float32),
                               ml_dtypes.bfloat16).astype(np.float32)
            ws_mid = np.asarray(
                (t64 - ws_hi).astype(np.float32), ml_dtypes.bfloat16
            ).astype(np.float32)
            left = np.abs(t64 - ws_hi - ws_mid)
            l64 = w64 * self.scale_lo[drow]
            ws_lo = np.asarray(l64.astype(np.float32),
                               ml_dtypes.bfloat16).astype(np.float32)
            left_lo = np.abs(l64 - ws_lo)
            # error budget: residual-int8 rounding (0.5*s_lo per matched
            # term) + exact bf16 split leftovers x |C8|<=127 + an f32
            # accumulation slack RELATIVE TO THE SCORE MAGNITUDE bound
            # (smax) — with the quantization terms ~100x smaller, summation
            # rounding is no longer negligible next to them
            np.add.at(err_acc, dq,
                      0.5 * w64 * self.scale_lo[drow]
                      + (left + left_lo) * 127.0)
            smax_acc = np.zeros(Q, np.float64)
            np.add.at(smax_acc, dq,
                      (np.abs(ws_hi) + np.abs(ws_mid) + np.abs(ws_lo))
                      * 127.0)
            err_ubs = (err_acc * (1.0 + 1e-5) + smax_acc * 1e-6
                       + 1e-6).astype(np.float32)
            wq_qi = np.concatenate([dq, dq, dq])
            wq_col = np.concatenate([drow, drow + n_b, drow + 2 * n_b])
            wq_val = np.concatenate([ws_hi, ws_mid, ws_lo])
        n_w = wq_qi.size
        # COO sizes above the bucket ladder round UP to the next multiple of
        # the top bucket: exact-size padding would compile one fresh device
        # program per distinct n_w (minutes each through the remote compile
        # service) for long/document-style query batches
        _top = _WQ_BUCKETS[-1]
        Pw = next((b for b in _WQ_BUCKETS if b >= n_w),
                  _top * ((n_w + _top - 1) // _top))
        # ONE packed (3, P) f32 upload (see densify): [row; col; value],
        # pad rows route to the drop sentinel; int8 mode appends the
        # (3, query_chunk) per-query scale block
        ncols = Pw + (self.query_chunk if scales_blk is not None else 0)
        wq = np.zeros((3, ncols), np.float32)
        wq[0, :Pw] = self.query_chunk
        wq[0, :n_w] = wq_qi
        wq[1, :n_w] = wq_col
        wq[2, :n_w] = wq_val
        if scales_blk is not None:
            wq[:, Pw:] = scales_blk

        # full per-query term lists (ascending tid) for exact rescoring —
        # precomputed HERE so the work overlaps the device scoring instead
        # of sitting on the post-fetch critical path
        fq = np.concatenate([dq, rq])
        ft = np.concatenate([self.dense_terms[drow], r_tids_a])
        fw = np.concatenate([w64, r_w_a.astype(np.float64)])
        order = np.lexsort((ft, fq))
        q_tids_a = ft[order]
        q_w_a = fw[order].astype(np.float32)
        q_indptr_a = np.zeros(Q + 1, np.int64)
        np.add.at(q_indptr_a, fq + 1, 1)
        np.cumsum(q_indptr_a, out=q_indptr_a)

        self.stats["t_split_s"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        packed_dev = self._run(
            jnp.asarray(wq), self._C, self.topk_device,
        )
        self.stats["t_dispatch_s"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        # rare-touched docs per query (native when built, Python otherwise)
        touch = None
        if r_tids_a.size:
            try:
                from ..native import bm25_rare_touch

                cap = int(np.sum(bm._inv_indptr[r_tids_a + 1]
                                 - bm._inv_indptr[r_tids_a]))
                touch = bm25_rare_touch(
                    bm._inv_indptr, bm._inv_docs, bm._inv_quot, bm.idf,
                    bm.k1, r_indptr_a, r_tids_a, r_w_a, cap,
                )
            except (ImportError, OSError):
                touch = None
        if touch is None:
            ti = [0]
            td_parts, ts_parts = [], []
            for qi in range(Q):
                rs, re = int(r_indptr_a[qi]), int(r_indptr_a[qi + 1])
                d, s = self._rare_touched(
                    r_tids_a[rs:re].tolist(), r_w_a[rs:re].tolist())
                td_parts.append(d)
                ts_parts.append(s)
                ti.append(ti[-1] + d.size)
            touch = (
                np.asarray(ti, np.int64),
                np.concatenate(td_parts) if td_parts else
                np.zeros(0, np.int32),
                np.concatenate(ts_parts) if ts_parts else
                np.zeros(0, np.float32),
            )
        self.stats["t_rare_s"] += _time.perf_counter() - _t0
        return (q_indptr_a, q_tids_a, q_w_a, err_ubs, touch, packed_dev)

    def _finish_chunk(self, qs, state, k, idx_out, sc_out) -> None:
        """Blocking fetch of the device candidates + exact rescoring +
        certification (+ one batched host fallback for uncertified
        queries)."""
        import time as _time

        q_indptr_a, q_tids_a, q_w_a, err_ubs, touch, packed_dev = state
        bm = self.bm
        Q = len(qs)
        kp = self.topk_device
        touch_indptr, touch_docs, touch_scores = touch
        n_pairs = int(touch_indptr[Q])
        _t0 = _time.perf_counter()
        # ONE blocking fetch of the packed (Q, 2K') int32 result;
        # ascontiguousarray is LOAD-BEARING: the remote TPU backend
        # materializes device arrays F-contiguous, and the native post
        # kernel reads raw row-major memory
        packed = np.asarray(packed_dev[:Q])
        vals = np.ascontiguousarray(packed[:, :kp]).view(np.float32)
        # astype on the slice already returns a fresh C-contiguous array
        # (the contiguity note above matters only for the zero-copy view)
        idx = packed[:, kp:].astype(np.int64)
        self.stats["queries"] += Q
        self.stats["t_device_s"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        native_post = None
        try:
            from ..native import bm25_device_post

            native_post = bm25_device_post(
                bm._inv_indptr, bm._inv_docs, bm._inv_quot, bm.idf, bm.k1,
                vals, idx, self.topk_device,
                touch_indptr[: Q + 1].copy(), touch_docs[:n_pairs].copy(),
                q_indptr_a, q_tids_a, q_w_a, err_ubs,
                self.n_docs, k,
            )
        except (ImportError, OSError):
            native_post = None
        if native_post is not None:
            n_idx, n_sc, flags = native_post
            idx_out[:Q] = n_idx
            sc_out[:Q] = n_sc
            self.stats["t_post_s"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            flagged = np.nonzero(flags)[0]
            if flagged.size:
                # one BATCHED native host call for every uncertified query
                self.stats["fallbacks"] += int(flagged.size)
                fi, fs = bm.get_topk_batch([qs[qi] for qi in flagged], k)
                for row, qi in enumerate(flagged):
                    idx_out[qi], sc_out[qi] = fi[row], fs[row]
            self.stats["t_fallback_s"] += _time.perf_counter() - _t0
            return

        # ------------------------- pure-Python reference post-processing
        # (small-corpus correctness path: exact-scores EVERY candidate; the
        # C++ kernel reaches the identical result lazily)
        for qi in range(Q):
            ts_, te_ = int(touch_indptr[qi]), int(touch_indptr[qi + 1])
            r_docs = touch_docs[ts_:te_]
            err_ub = float(err_ubs[qi])
            cand = np.unique(np.concatenate([idx[qi], r_docs]))
            # PAD-COLUMN ids (>= n_docs) can enter the device top-K' when
            # fewer than K' docs have positive approx scores (pads score
            # exactly 0.0 pre-mask). They are not documents: drop them from
            # the pool, and SOUND-ify the outside-pool bound — if a pad was
            # selected, every real doc with approx > 0 IS a candidate, so
            # any non-candidate's approx is <= 0 (the masked -inf in
            # vals[-1] would make the certificate vacuously true).
            pads = bool(cand[-1] >= self.n_docs) if cand.size else False
            if pads:
                cand = cand[cand < self.n_docs]
            qs_, qe_ = int(q_indptr_a[qi]), int(q_indptr_a[qi + 1])
            q_tids = q_tids_a[qs_:qe_]
            q_w = q_w_a[qs_:qe_]
            exact = self._exact_scores(q_tids, q_w, cand)
            t_order = np.lexsort((cand, -exact))
            kth = float(exact[t_order[k - 1]]) if exact.size >= k else -np.inf
            # any doc outside the pool: true score <= v_K' + err_ub
            v_last = 0.0 if pads else float(vals[qi, -1])
            v_out = (v_last + err_ub) \
                if cand.size < self.n_docs else -np.inf
            certified = v_out < kth
            kth_val = kth if exact.size >= k else 0.0
            if (not certified) or exact.size < k or kth_val <= 0.0:
                # uncertified, under-filled, or zero/negative boundary
                # (fill + epsilon-floor semantics): exact host answer
                self.stats["fallbacks"] += 1
                fi, fs = self.bm.get_topk(qs[qi], k)
                idx_out[qi], sc_out[qi] = fi, fs
                continue
            top = t_order[:k]
            idx_out[qi] = cand[top]
            sc_out[qi] = exact[top]
