"""Contiguous semantic splitting: C99 divisive clustering + valley detection.

Behavioral rebuild of ``Method/Semantic_Splitter_Optimized.py`` with the hot
math restructured for TPU:

- Embeddings come from the Flax encoder in one device batch.
- The C99 rank matrix is computed on device with a double-argsort
  (``ops.similarity.rank_matrix_global``, O(n^2 log n)) or the vectorized
  local-mask variant, replacing the reference's O(n^3)/Python-loop versions
  (``Semantic_Splitter_Optimized.py:171-192``).
- The divisive-clustering scan uses a 2D prefix sum of the rank matrix, so
  every candidate cut's block means are O(1) instead of re-summing submatrices
  (the reference re-slices R per candidate, ``:209-238``).
- Valley detection, hybrid voting, NMS, soft-cap re-cuts, boundary snapping
  and short-merge are cheap O(n) host logic, semantics preserved from
  ``:267-338`` and ``:480-652`` (including auto-parameter derivations at
  ``:415-479``).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import ChunkingConfig

Chunk = Tuple[str, str, Optional[str]]


# --------------------------------------------------------------------------
# Small host-side signal utilities
# --------------------------------------------------------------------------

def median_smooth(arr: Sequence[float], window: int = 3) -> np.ndarray:
    """Odd-window median filter with edge replication."""
    x = np.asarray(arr, dtype=np.float64)
    w = int(window)
    if w <= 1 or x.size == 0 or w > max(1, x.size):
        return x.copy()
    if w % 2 == 0:
        w += 1
    half = w // 2
    padded = np.concatenate([np.full(half, x[0]), x, np.full(half, x[-1])])
    windows = np.lib.stride_tricks.sliding_window_view(padded, w)
    return np.median(windows, axis=1)


def _mad(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    med = float(np.median(x))
    return float(np.median(np.abs(x - med)) + 1e-9)


def _iqr(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    return float(np.percentile(x, 75) - np.percentile(x, 25))


def robust_sigmoid(x: np.ndarray, tau: float) -> np.ndarray:
    """Median/MAD z-score followed by a temperature sigmoid."""
    med = float(np.median(x))
    mad = _mad(x)
    scale = mad if mad > 0 else float(x.std()) + 1e-9
    z = np.clip((x - med) / scale / max(tau, 1e-9), -60.0, 60.0)
    return 1.0 / (1.0 + np.exp(-z))


def score_based_nms(
    boundaries: Sequence[int], scores: Dict[int, float], min_spacing: int
) -> List[int]:
    """Greedy NMS keeping higher-score boundaries when too close."""
    spacing = max(1, int(min_spacing))
    ordered = sorted(boundaries, key=lambda b: (-scores.get(b, 0.0), b))
    kept: List[int] = []
    for b in ordered:
        if all(abs(b - x) >= spacing for x in kept):
            kept.append(b)
    return sorted(set(kept))


# --------------------------------------------------------------------------
# C99 divisive segmentation over the rank matrix
# --------------------------------------------------------------------------

class _PrefixSum2D:
    """O(1) block sums of a dense matrix via a 2D integral image."""

    def __init__(self, mat: np.ndarray) -> None:
        p = np.zeros((mat.shape[0] + 1, mat.shape[1] + 1), dtype=np.float64)
        p[1:, 1:] = np.cumsum(np.cumsum(mat, axis=0), axis=1)
        self._p = p

    def block_sum(self, a, b):
        p = self._p
        return p[b, b] - p[a, b] - p[b, a] + p[a, a]

    def block_mean(self, a, b):
        size = np.asarray(b, dtype=np.float64) - np.asarray(a, dtype=np.float64)
        return self.block_sum(a, b) / np.maximum(size * size, 1.0)


def c99_boundaries(
    rank_matrix: np.ndarray,
    min_chunk_size: int = 3,
    max_cuts: Optional[int] = None,
    min_gain: float = 0.01,
    stopping: str = "gain",
    knee_c: float = 1.2,
    smooth_window: int = 3,
) -> List[int]:
    """Divisive segmentation maximizing inside-block rank density.

    Semantics follow the reference (``Semantic_Splitter_Optimized.py:205-264``):
    each step picks the (segment, cut) with the largest density gain
    ``0.5*(mean_left + mean_right) - mean_all``; 'gain' stopping applies an
    adaptive threshold ``max(min_gain, 0.1*|mean_all|)``; 'profile' stopping
    keeps splitting and picks the knee of the inside-density delta series.
    """
    R = np.asarray(rank_matrix, dtype=np.float64)
    n = R.shape[0]
    mcs = int(min_chunk_size)
    if n < 2 * mcs:
        return []
    ps = _PrefixSum2D(R)

    def inside_density(segments: List[Tuple[int, int]]) -> float:
        total = sum(ps.block_sum(a, b) for a, b in segments if b > a)
        area = sum((b - a) ** 2 for a, b in segments if b > a)
        return total / area if area else 0.0

    def best_cut_of(a: int, b: int) -> Tuple[float, int, float]:
        """Best (gain, cut, mean_all) within one segment, vectorized over cuts."""
        if (b - a) < 2 * mcs:
            return (-np.inf, -1, 0.0)
        mean_all = float(ps.block_mean(a, b))
        cuts = np.arange(a + mcs, b - mcs + 1)
        left = ps.block_mean(np.full_like(cuts, a), cuts)
        right = ps.block_mean(cuts, np.full_like(cuts, b))
        gains = 0.5 * (left + right) - mean_all
        j = int(np.argmax(gains))
        return (float(gains[j]), int(cuts[j]), mean_all)

    segs: List[Tuple[int, int]] = [(0, n)]
    seg_best: List[Tuple[float, int, float]] = [best_cut_of(0, n)]
    cuts: List[int] = []
    d_series: List[float] = [inside_density(segs)]

    while True:
        if max_cuts is not None and len(cuts) >= int(max_cuts):
            break
        idx = int(np.argmax([g for g, _, _ in seg_best])) if seg_best else -1
        if idx < 0:
            break
        best_gain, best_pos, mean_all = seg_best[idx]
        if best_pos < 0:
            break
        if stopping.lower() == "gain":
            adaptive_thr = max(float(min_gain), 0.1 * abs(mean_all))
            if best_gain < adaptive_thr:
                break
        a, b = segs.pop(idx)
        seg_best.pop(idx)
        for seg in ((a, best_pos), (best_pos, b)):
            segs.append(seg)
            seg_best.append(best_cut_of(*seg))
        cuts.append(best_pos)
        d_series.append(inside_density(sorted(segs)))

    if stopping.lower() != "profile" or not cuts:
        return sorted(set(cuts))

    # Profile stopping: knee of the smoothed delta-density series.
    deltas = np.diff(np.asarray(d_series))
    if deltas.size == 0:
        return sorted(set(cuts))
    sw = max(1, int(smooth_window))
    if sw > 1 and deltas.size >= sw:
        deltas_s = np.convolve(deltas, np.ones(sw) / sw, mode="same")
    else:
        deltas_s = deltas
    thr = float(deltas_s.mean()) - knee_c * float(deltas_s.std() + 1e-9)
    below = np.nonzero(deltas_s < thr)[0]
    if below.size == 0:
        return sorted(set(cuts))
    m = max(1, int(below[0]) + 1)  # number of segments at the knee
    return sorted(set(cuts[: min(m - 1, len(cuts))]))


def c99_gain_curve(
    rank_matrix: np.ndarray, min_chunk_size: int = 3
) -> Tuple[np.ndarray, np.ndarray]:
    """Root-segment cut-gain profile: gain(c) for every candidate first cut.

    The C99 density signal the reference's 4-panel debug plot shows
    (``simple_chunk_controller.py:731-943``): gain(c) = 0.5*(mean_left +
    mean_right) - mean_all over the whole document. Returns (positions,
    gains); empty arrays when the document is too short to cut.
    """
    R = np.asarray(rank_matrix, dtype=np.float64)
    n = R.shape[0]
    mcs = int(min_chunk_size)
    if n < 2 * mcs:
        return np.array([], dtype=int), np.array([])
    ps = _PrefixSum2D(R)
    mean_all = float(ps.block_mean(0, n))
    cuts = np.arange(mcs, n - mcs + 1)
    left = ps.block_mean(np.zeros_like(cuts), cuts)
    right = ps.block_mean(cuts, np.full_like(cuts, n))
    return cuts, 0.5 * (left + right) - mean_all


# --------------------------------------------------------------------------
# Valley detection on the adjacent-similarity signal
# --------------------------------------------------------------------------

def valley_candidates(
    adj_sims: Sequence[float],
    triplet_tau: float = 0.12,
) -> List[Tuple[int, float, float]]:
    """All raw valley candidates as (position, strength, score).

    Valleys = decreasing->increasing runs of adjacent similarity; strength
    is the left drop + right rise at the run minimum; score is the z-scored
    sigmoid over all candidates (reference
    ``Semantic_Splitter_Optimized.py:267-338``). No spacing/first-index
    filtering — that happens in :func:`valley_boundaries`; the full
    candidate set also feeds the NMS-decision debug panels.
    """
    sims = np.asarray(adj_sims, dtype=np.float64)
    n = sims.size
    if n < 3:
        return []

    raw: List[Tuple[int, float]] = []
    i = 1
    while i <= n - 2:
        if not sims[i] <= sims[i - 1]:
            i += 1
            continue
        j = i
        min_idx = i
        while j + 1 <= n - 2 and sims[j + 1] <= sims[j]:
            j += 1
            if sims[j] < sims[min_idx]:
                min_idx = j
        if j < n - 1 and sims[j + 1] >= sims[j]:
            left_drop = max(0.0, sims[min_idx - 1] - sims[min_idx]) if min_idx > 0 else 0.0
            right_rise = max(0.0, sims[min_idx + 1] - sims[min_idx]) if min_idx + 1 < n else 0.0
            raw.append((min_idx + 1, left_drop + right_rise))
        i = j + 1

    if not raw:
        return []
    strengths = np.array([s for _, s in raw])
    z = (strengths - strengths.mean()) / (strengths.std() + 1e-9)
    scores = 1.0 / (1.0 + np.exp(-(z / max(triplet_tau, 1e-9))))
    return [
        (b, float(s), float(sc)) for (b, s), sc in zip(raw, scores)
    ]


def valley_boundaries(
    adj_sims: Sequence[float],
    triplet_tau: float = 0.12,
    min_boundary_spacing: int = 2,
    min_first_boundary_index: int = 5,
) -> List[int]:
    """Valley candidates filtered by first-index and spacing-NMS (reference
    ``Semantic_Splitter_Optimized.py:313-338``)."""
    cands = [
        (b, sc, s)
        for b, s, sc in valley_candidates(adj_sims, triplet_tau)
        if b >= int(min_first_boundary_index)
    ]
    if not cands:
        return []
    cands.sort(key=lambda x: (-x[1], -x[2]))
    kept: List[int] = []
    spacing = max(1, int(min_boundary_spacing))
    for b, _, _ in cands:
        if all(abs(b - x) >= spacing for x in kept):
            kept.append(b)
    return sorted(set(kept))


# --------------------------------------------------------------------------
# Full splitting pipeline over precomputed sentence embeddings
# --------------------------------------------------------------------------

def _groups_from_boundaries(n: int, boundaries: Sequence[int]) -> List[List[int]]:
    groups = []
    cursor = 0
    for b in list(boundaries) + [n]:
        if b > cursor:
            groups.append(list(range(cursor, b)))
        cursor = b
    return groups


def batched_split_signals(
    embs_list: Sequence[np.ndarray],
    bucket: Optional[int] = None,
):
    """Compute (rank_matrix, adj_sims) for MANY documents in one device call.

    Documents are zero-padded to one bucket length; padded similarity entries
    are set to -inf before the double-argsort, which assigns them the lowest
    ranks and shifts every real entry's row/col rank by exactly the pad
    count — subtracted afterwards, so the returned rank matrices are
    bit-identical to the per-document computation. This replaces one device
    round-trip per document with one per bucket (the per-doc dispatch
    latency dominated chunking throughput through remote-device links).
    """
    import jax
    import jax.numpy as jnp

    if not embs_list:
        return []
    d = embs_list[0].shape[1]
    lens = [e.shape[0] for e in embs_list]
    L = bucket or max(lens)
    B = len(embs_list)
    emb = np.zeros((B, L, d), np.float32)
    mask = np.zeros((B, L), np.float32)
    for i, e in enumerate(embs_list):
        emb[i, : lens[i]] = e
        mask[i, : lens[i]] = 1.0

    @jax.jit
    def _signals(emb, mask):
        S = jnp.einsum(
            "bid,bjd->bij", emb, emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        pair = mask[:, :, None] * mask[:, None, :]
        S_m = jnp.where(pair > 0, S, -jnp.inf)
        row_rank = jnp.argsort(jnp.argsort(S_m, axis=2), axis=2)
        col_rank = jnp.argsort(jnp.argsort(S_m, axis=1), axis=1)
        pad = (L - jnp.sum(mask, axis=1))[:, None, None]
        R = row_rank.astype(jnp.float32) + col_rank.astype(jnp.float32) - 2 * pad
        adj = jnp.sum(emb[:, :-1] * emb[:, 1:], axis=-1)
        return R, adj

    R_all, adj_all = (np.asarray(x) for x in _signals(
        jnp.asarray(emb), jnp.asarray(mask)
    ))
    return [
        (R_all[i, : lens[i], : lens[i]], adj_all[i, : max(lens[i] - 1, 0)])
        for i in range(B)
    ]


def split_by_embeddings(
    embeddings: np.ndarray,
    cfg: ChunkingConfig = ChunkingConfig(),
    signals: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> List[List[int]]:
    """Segment n sentences (given their unit-norm embeddings) into contiguous
    groups of sentence indices. Returns a partition of range(n).

    ``signals`` optionally provides precomputed (rank_matrix, adj_sims) from
    :func:`batched_split_signals` to avoid per-document device calls.
    """
    emb = np.asarray(embeddings, dtype=np.float32)
    n = emb.shape[0]
    if n <= 1:
        return [list(range(n))] if n else []

    if signals is not None and not cfg.c99_use_local_rank:
        R, adj_sims = signals
        adj_sims = np.asarray(adj_sims, dtype=np.float64)
    else:
        import jax.numpy as jnp

        from ..ops.similarity import (
            adjacent_similarities,
            rank_matrix_global,
            rank_matrix_local,
            similarity_matrix,
        )

        emb_j = jnp.asarray(emb)
        adj_sims = np.asarray(adjacent_similarities(emb_j), dtype=np.float64)
        S = similarity_matrix(emb_j)
        if cfg.c99_use_local_rank:
            R = np.asarray(rank_matrix_local(S, mask_size=cfg.c99_mask_size))
        else:
            R = np.asarray(rank_matrix_global(S))

    # --- signal shaping + auto params (reference :415-479) ---
    adj_base = median_smooth(adj_sims, cfg.smooth_adj_window)
    min_spacing = cfg.min_boundary_spacing
    min_first = cfg.min_first_boundary_index
    valley_tau = cfg.valley_tau
    hybrid_mode = cfg.hybrid_mode
    vote_thr = cfg.vote_thr
    if cfg.auto_params:
        tau_auto = max(_iqr(adj_base) / 2.0, 0.05)
        adj_for_valley = robust_sigmoid(adj_base, tau_auto)
        min_spacing = max(5, int(round(n / 50)))
        min_first = max(min_first, int(round(0.05 * n)))
        valley_tau = max(_iqr(adj_base) / 2.0, 0.06)
        hybrid_mode = "union_weighted"
        vote_thr = 0.75
    else:
        adj_for_valley = adj_base

    c99_min_chunk = max(3, int(min_spacing))
    c99 = c99_boundaries(
        R,
        min_chunk_size=c99_min_chunk,
        min_gain=cfg.c99_min_gain,
        stopping=cfg.c99_stopping,
        knee_c=cfg.c99_knee_c,
        smooth_window=cfg.smooth_adj_window,
    )
    valley = valley_boundaries(
        adj_for_valley,
        triplet_tau=valley_tau,
        min_boundary_spacing=min_spacing,
        min_first_boundary_index=min_first,
    )

    # --- hybrid combine (reference :480-523) ---
    c99_set, valley_set = set(c99), set(valley)
    if hybrid_mode == "union_weighted":
        # DIVERGENCE (documented fix of a latent reference defect): the
        # reference's union_weighted vote (:480-491) counts a valley vote
        # for a C99 boundary only on EXACT index equality, but the two legs
        # systematically disagree by 1-2 (valley indexes the minimum of the
        # median-smoothed signal, C99 the rank-block edge), so with
        # vote_thr > 0.5 the vote is almost always empty and chunking
        # degenerates to arbitrary soft-cap cuts. Here agreement uses the
        # same snap tolerance the reference's own intersection mode uses
        # (:499), and an empty vote falls back to the C99 cuts (mirroring
        # the intersection fallback at :522-523). Measured on the realistic
        # chunking A/B: this is the difference between ~2 arbitrary chunks
        # per document and recovering the gold topic boundaries.
        # The tolerance match also changes behavior at vote_thr <= 0.5
        # (ADVICE r4): the reference would keep a C99 boundary AND its
        # nearby valley as two separate 0.5-score candidates pre-NMS,
        # whereas this rebuild snaps a matched valley ONTO the C99 index
        # (the valley is dropped, the C99 position scores 1.0) — intended,
        # since NMS would have collapsed the pair anyway and the C99 edge
        # is the better-calibrated position of the two.
        tol = max(1, int(min_spacing) - 1)
        vs = sorted(valley_set)
        score_map = {}
        for c in sorted(c99_set):
            near_valley = any(abs(v - c) <= tol for v in vs)
            score_map[c] = 0.5 + (0.5 if near_valley else 0.0)
        matched = {v for v in vs
                   if any(abs(v - c) <= tol for c in c99_set)}
        for v in vs:
            if v not in matched:
                score_map[v] = 0.5
        boundaries = [b for b in sorted(score_map)
                      if score_map[b] >= vote_thr]
        if not boundaries:
            boundaries = sorted(c99_set)
            score_map = {b: 0.5 for b in boundaries}
    elif hybrid_mode == "union":
        boundaries = sorted(c99_set | valley_set)
        score_map = {
            b: 1.0 if (b in c99_set and b in valley_set)
            else 0.8 if b in valley_set else 0.7
            for b in boundaries
        }
    else:  # intersection with snap tolerance
        tol = max(1, int(min_spacing) - 1)
        vs = sorted(valley_set)
        chosen = []
        for c in sorted(c99_set):
            if any(abs(v - c) <= tol for v in vs):
                chosen.append(c)
        boundaries = sorted(set(chosen))
        score_map = {b: 1.0 for b in boundaries}

    boundaries = score_based_nms(boundaries, score_map, min_spacing)
    if hybrid_mode == "intersection" and not boundaries:
        boundaries = sorted(c99_set)

    # --- optional DP-optimal refinement over all candidate cuts ---
    if cfg.use_dp_refine:
        from .dp_segment import auto_penalty, dp_optimal_segmentation

        cand = [c for c in sorted(c99_set | valley_set | set(boundaries))
                if 0 < c < n]
        if cand:
            penalty = (
                cfg.dp_penalty if cfg.dp_penalty is not None
                else auto_penalty(adj_base) * float(cfg.dp_penalty_scale)
            )
            # the DP's answer is authoritative, INCLUDING the empty list —
            # zero cuts means the whole document is the optimal segmentation
            # (every candidate's coherence gain is below the penalty), not a
            # failure to refine
            boundaries = dp_optimal_segmentation(adj_base, cand,
                                                 penalty=penalty)

    # --- soft cap: re-cut overlong segments at local sim minima (:543-595) ---
    cap = cfg.soft_cap
    if cfg.auto_params and cap is None:
        cap = max(24, int(round(n * 0.12)))
    if cap and cap > 0:
        delta = int(cfg.soft_cap_delta)
        new_bs: List[int] = []
        prev = 0
        for cut in sorted(boundaries) + [n]:
            while (cut - prev) > cap and (cut - prev) >= 3:
                target = prev + cap
                lo = max(prev + 1, target - delta)
                hi = min(cut - 1, target + delta)
                if hi <= lo:
                    break
                local = adj_sims[max(prev, lo - 1): min(cut - 1, hi)]
                if local.size == 0:
                    break
                pos = max(prev + 1, lo + int(np.argmin(local)))
                if prev == 0 and pos < int(min_first):
                    pos = int(min_first)
                pos = min(max(pos, prev + 1), cut - 1)
                new_bs.append(pos)
                prev = pos
            if cut != n:
                new_bs.append(cut)
            prev = cut
        if new_bs:
            boundaries = sorted({b for b in new_bs if 1 <= b < n})

    # --- boundary snap to nearby adj-sim minima (:597-628) ---
    if cfg.auto_params and boundaries:
        win = 2
        snapped = []
        for b in sorted(boundaries):
            lo, hi = max(1, b - win), min(n - 1, b + win)
            if hi <= lo:
                snapped.append(b)
                continue
            local = adj_base[lo - 1: hi]
            if local.size == 0:
                snapped.append(b)
                continue
            snapped.append(int(np.clip(lo + int(np.argmin(local)), 1, n - 1)))
        boundaries = sorted(set(snapped))

    groups = _groups_from_boundaries(n, boundaries)

    # --- merge short segments (:630-652) ---
    if cfg.auto_params and groups:
        lens = [len(g) for g in groups]
        min_len = max(3, int(round(np.percentile(lens, 10)))) if len(lens) >= 5 else 3
        merged: List[List[int]] = []
        buf: Optional[List[int]] = None
        for g in groups:
            if buf is None:
                buf = g
            elif len(buf) < min_len:
                buf = list(range(buf[0], g[-1] + 1))
            else:
                merged.append(buf)
                buf = g
        if buf is not None:
            merged.append(buf)
        groups = merged

    return groups


def chunk_passage_splitter(
    doc_id: str,
    sentences: List[str],
    embeddings: np.ndarray,
    cfg: ChunkingConfig = ChunkingConfig(),
    collect_metadata: bool = False,
    signals: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> List[Chunk]:
    """Emit (chunk_id, chunk_text, metadata) triples for one document.

    Same output contract as ``chunk_passage_text_splitter``
    (``Semantic_Splitter_Optimized.py:723-744``), with per-chunk adjacent-sim
    stats in the metadata when requested (``:695-717``).
    """
    if not sentences:
        return []
    if len(sentences) == 1:
        return [(f"{doc_id}_chunk0", sentences[0], None)]
    groups = split_by_embeddings(embeddings, cfg, signals=signals)
    emb = np.asarray(embeddings, dtype=np.float32)
    out: List[Chunk] = []
    for idx, grp in enumerate(groups):
        text = " ".join(sentences[grp[0]: grp[-1] + 1])
        if not text:
            continue
        cid = f"{doc_id}_chunk{idx}"
        meta = None
        if collect_metadata:
            m = {
                "chunk_id": cid,
                "sent_indices": ",".join(map(str, grp)),
                "n": len(grp),
            }
            if len(grp) > 1:
                sims = [float(emb[a] @ emb[b]) for a, b in zip(grp, grp[1:])]
                m.update(
                    sim_mean=round(float(np.mean(sims)), 4),
                    sim_min=round(float(np.min(sims)), 4),
                    sim_max=round(float(np.max(sims)), 4),
                    sim_std=round(float(np.std(sims)), 4),
                )
            meta = json.dumps(m, ensure_ascii=False)
        out.append((cid, text, meta))
    if not out:
        return [(f"{doc_id}_fallback", " ".join(sentences), None)]
    return out
