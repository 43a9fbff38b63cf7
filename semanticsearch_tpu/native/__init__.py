"""ctypes loader for the native host-path kernels.

Loads ``libsemsearch_native.so`` (built by the Makefile in this directory;
``ensure_built()`` invokes make on first use when a compiler is available).
Every consumer has a pure-Python fallback, so the package works without the
library — the native path just keeps the host core from bottlenecking the
TPU on tokenization and BM25 (see semsearch_native.cpp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsemsearch_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


_ABI_VERSION = 9


def ensure_built(quiet: bool = True, force: bool = False) -> bool:
    """Build the shared library if missing (or ``force``). Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR] + (["-B"] if force else []),
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not ensure_built():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    try:
        lib.semsearch_native_abi_version.restype = ctypes.c_int32
        abi = lib.semsearch_native_abi_version()
    except AttributeError:
        # a .so that predates the ABI-version export (or a foreign library
        # squatting the name): treat exactly like a stale ABI — rebuild —
        # rather than raising through callers' (ImportError, OSError)
        # fallbacks and crashing paths that are documented to degrade
        abi = -1
    if abi != _ABI_VERSION:
        # Stale binary from an older source revision: rebuild, then load
        # the fresh build through a COPY at a new path — ctypes never
        # dlcloses, and re-CDLL'ing the original path returns the cached
        # stale handle (glibc dedups by name), so reloading in place can
        # never take effect in-process.
        if not ensure_built(force=True):
            return None
        import shutil
        import tempfile

        # the copy lives NEXT TO the original .so: the package dir is
        # proven executable (the stale lib just loaded from it), whereas
        # the system temp dir may be mounted noexec on hardened hosts
        tmp = tempfile.NamedTemporaryFile(
            suffix=".so", prefix="semsearch_native_", dir=_DIR, delete=False
        )
        tmp.close()
        try:
            shutil.copy2(_LIB_PATH, tmp.name)
            lib = ctypes.CDLL(tmp.name)
        except OSError:
            os.unlink(tmp.name)
            return None
        os.unlink(tmp.name)  # the mapping survives the unlink (Linux)
        try:
            lib.semsearch_native_abi_version.restype = ctypes.c_int32
            abi = lib.semsearch_native_abi_version()
        except AttributeError:
            return None  # rebuild didn't produce our library: fallback
        if abi != _ABI_VERSION:
            return None  # stale source tree / wrong Makefile target
    lib.hash_tokenize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.subword_tokenize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bm25_score_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_topk_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_topk_maxscore_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_rare_touch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_device_post.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    if lib.semsearch_native_abi_version() != _ABI_VERSION:
        return None
    _lib = lib
    return _lib


def _i64p(a: np.ndarray):
    assert a.dtype == np.int64 and a.flags["C_CONTIGUOUS"], (a.dtype, a.flags)
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a: np.ndarray):
    assert a.dtype == np.float32 and a.flags["C_CONTIGUOUS"], \
        (a.dtype, a.flags)
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    assert a.dtype == np.int32 and a.flags["C_CONTIGUOUS"], (a.dtype, a.flags)
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def hash_tokenize_batch(
    texts, vocab_size: int, max_len: int, add_cls: bool
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native FNV-1a tokenizer; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    blobs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    buf = np.frombuffer(b"".join(blobs) + b"\x00", dtype=np.uint8)
    ids = np.zeros((len(blobs), max_len), np.int32)
    mask = np.zeros((len(blobs), max_len), np.int32)
    lib.hash_tokenize_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _i64p(offsets), len(blobs), vocab_size, max_len, int(add_cls),
        _i32p(ids), _i32p(mask),
    )
    return ids, mask


def subword_tokenize_batch(
    texts, piece_tables, max_len: int, add_cls: bool
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native WordPiece greedy longest-match tokenizer; None if the library
    is unavailable. ``piece_tables`` is ``SubwordTokenizer._native_tables()``:
    (piece byte blob u8, piece offsets i64 (n+1), piece ids i32 (n))."""
    lib = get_lib()
    if lib is None:
        return None
    blob, offsets, piece_ids = piece_tables
    tblobs = [t.encode("utf-8") for t in texts]
    toffsets = np.zeros(len(tblobs) + 1, np.int64)
    np.cumsum([len(b) for b in tblobs], out=toffsets[1:])
    tbuf = np.frombuffer(b"".join(tblobs) + b"\x00", dtype=np.uint8)
    ids = np.zeros((len(tblobs), max_len), np.int32)
    mask = np.zeros((len(tblobs), max_len), np.int32)
    lib.subword_tokenize_batch(
        tbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _i64p(toffsets), len(tblobs),
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _i64p(offsets), _i32p(piece_ids), len(piece_ids),
        max_len, int(add_cls), _i32p(ids), _i32p(mask),
    )
    return ids, mask


def bm25_rare_touch(
    inv_indptr, inv_docs, inv_quot, idf, k1,
    r_indptr, r_tids, r_w, capacity: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-query rare-touched docs (ascending) + exact rare scores; None if
    the library is unavailable. ``capacity`` = sum of rare-term dfs (upper
    bound on touched entries)."""
    lib = get_lib()
    if lib is None:
        return None
    n_queries = len(r_indptr) - 1
    out_indptr = np.zeros(n_queries + 1, np.int64)
    out_docs = np.zeros(max(capacity, 1), np.int32)
    out_scores = np.zeros(max(capacity, 1), np.float32)
    lib.bm25_rare_touch(
        _i64p(inv_indptr), _i32p(inv_docs), _f32p(inv_quot), _f32p(idf),
        ctypes.c_float(k1),
        _i64p(r_indptr), _i64p(r_tids), _f32p(r_w), n_queries,
        _i64p(out_indptr), _i32p(out_docs), _f32p(out_scores),
    )
    return out_indptr, out_docs, out_scores


def bm25_device_post(
    inv_indptr, inv_docs, inv_quot, idf, k1,
    vals, idx, kp,
    touch_indptr, touch_docs,
    q_indptr, q_tids, q_w, err_ub,
    n_docs: int, k: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Candidate merge + exact rescore + certification for the device-BM25
    path (rare-touched docs are exact-scored inside); returns (idx (Q,k),
    scores (Q,k), fallback_flags (Q,)). None if the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n_queries = len(q_indptr) - 1
    idx_out = np.zeros((n_queries, k), np.int64)
    sc_out = np.zeros((n_queries, k), np.float32)
    flags = np.zeros(n_queries, np.uint8)
    lib.bm25_device_post(
        _i64p(inv_indptr), _i32p(inv_docs), _f32p(inv_quot), _f32p(idf),
        ctypes.c_float(k1),
        _f32p(vals), _i64p(idx), kp,
        _i64p(touch_indptr), _i32p(touch_docs),
        _i64p(q_indptr), _i64p(q_tids), _f32p(q_w), _f32p(err_ub),
        n_queries, n_docs, k,
        _i64p(idx_out), _f32p(sc_out),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return idx_out, sc_out, flags


def bm25_score_batch(
    doc_indptr: np.ndarray,
    doc_termids: np.ndarray,
    doc_quot: np.ndarray,
    idf: np.ndarray,
    q_indptr: np.ndarray,
    q_termids: np.ndarray,
    q_weights: np.ndarray,
    k1: float,
) -> Optional[np.ndarray]:
    """Native CSR BM25 batch scorer; None if the library is unavailable.

    doc_termids must be sorted within each document's CSR slice, and
    q_termids sorted within each query's slice (merge-join contract).
    q_weights carries each query term's occurrence count (rank_bm25
    multiplicity semantics).
    """
    lib = get_lib()
    if lib is None:
        return None
    n_docs = len(doc_indptr) - 1
    n_queries = len(q_indptr) - 1
    out = np.zeros((n_queries, n_docs), np.float32)
    lib.bm25_score_batch(
        _i64p(doc_indptr), _i32p(doc_termids), _f32p(doc_quot),
        _f32p(idf), n_docs,
        _i64p(q_indptr), _i64p(q_termids), _f32p(q_weights), n_queries,
        ctypes.c_float(k1), _f32p(out),
    )
    return out


def bm25_topk_batch(
    inv_indptr: np.ndarray,
    inv_docs: np.ndarray,
    inv_quot: np.ndarray,
    idf: np.ndarray,
    n_docs: int,
    q_indptr: np.ndarray,
    q_termids: np.ndarray,
    q_weights: np.ndarray,
    k1: float,
    k: int,
    n_threads: int = 1,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native threaded serve-time BM25 top-k over term-major postings;
    None if the library is unavailable. Returns (idx (Q,k) i64,
    scores (Q,k) f32). Semantics match BM25Okapi.get_topk's sparse path
    (ties to lower doc id, lowest-id zero-score fill); scoring runs on the
    precomputed per-entry quotients (one multiply-add per posting). Each
    thread allocates ~5*n_docs bytes of scratch — cap n_threads at large
    corpora.
    """
    lib = get_lib()
    if lib is None:
        return None
    n_queries = len(q_indptr) - 1
    idx = np.zeros((n_queries, k), np.int64)
    scores = np.zeros((n_queries, k), np.float32)
    lib.bm25_topk_batch(
        _i64p(inv_indptr), _i32p(inv_docs), _f32p(inv_quot),
        _f32p(idf), n_docs,
        _i64p(q_indptr), _i64p(q_termids), _f32p(q_weights), n_queries,
        ctypes.c_float(k1), k, n_threads, _i64p(idx), _f32p(scores),
    )
    return idx, scores


def bm25_topk_maxscore_batch(
    inv_indptr: np.ndarray,
    inv_docs: np.ndarray,
    inv_quot: np.ndarray,
    idf: np.ndarray,
    term_ub: np.ndarray,
    n_docs: int,
    q_indptr: np.ndarray,
    q_termids: np.ndarray,
    q_weights: np.ndarray,
    k1: float,
    k: int,
    n_threads: int = 1,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """MaxScore-pruned serve-time BM25 top-k (threaded across queries);
    None if the library is unavailable. EXACTLY the same results as
    :func:`bm25_topk_batch` but skips documents whose term upper bounds
    (``term_ub``, per-term max contribution, precomputed at invert time)
    prove they cannot enter the top-k — stopword postings stop being
    streamed once the k-th best score rises above their bound."""
    lib = get_lib()
    if lib is None:
        return None
    n_queries = len(q_indptr) - 1
    idx = np.zeros((n_queries, k), np.int64)
    scores = np.zeros((n_queries, k), np.float32)
    lib.bm25_topk_maxscore_batch(
        _i64p(inv_indptr), _i32p(inv_docs), _f32p(inv_quot),
        _f32p(idf), _f32p(term_ub), n_docs,
        _i64p(q_indptr), _i64p(q_termids), _f32p(q_weights), n_queries,
        ctypes.c_float(k1), k, n_threads, _i64p(idx), _f32p(scores),
    )
    return idx, scores
