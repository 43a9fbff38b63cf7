"""Visual debugging exports for chunking decisions.

Rebuild of the reference controller's debug visuals
(``data_process/simple_chunk_controller.py:670-1050``): per-document cosine
heatmaps with chunk-boundary overlays, multi-panel boundary-signal plots
(adjacent similarity, valley strength, C99 cuts) with the selected boundaries
annotated, grouping color strips showing cluster membership per sentence, and
optional ideal-boundary overlays loaded from ``{doc_id}.bounds`` files (the
``tideal_bounds/`` slots, reference ``:892-908``).

Matplotlib is imported lazily; every function degrades to a no-op return of
None when it is unavailable.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def load_ideal_bounds(bounds_dir: str, doc_id: str) -> Optional[List[int]]:
    """Read a ``{doc_id}.bounds`` file: whitespace/newline-separated sentence
    indices marking ideal boundaries (reference tideal_bounds contract)."""
    path = os.path.join(bounds_dir, f"{doc_id}.bounds")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return sorted({int(tok) for tok in f.read().split()})
    except ValueError:
        return None


def plot_similarity_heatmap(
    sim_matrix: np.ndarray,
    boundaries: Sequence[int],
    out_path: str,
    doc_id: str = "",
    ideal_bounds: Optional[Sequence[int]] = None,
) -> Optional[str]:
    """Cosine heatmap with chunk boundaries (white) and ideal bounds (cyan)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(8, 7))
    im = ax.imshow(np.asarray(sim_matrix), cmap="viridis", interpolation="nearest")
    for b in boundaries:
        ax.axhline(b - 0.5, color="white", linewidth=1.2)
        ax.axvline(b - 0.5, color="white", linewidth=1.2)
    for b in ideal_bounds or []:
        ax.axhline(b - 0.5, color="cyan", linewidth=0.8, linestyle="--")
        ax.axvline(b - 0.5, color="cyan", linewidth=0.8, linestyle="--")
    ax.set_title(f"sentence similarity — {doc_id}")
    fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_boundary_signals(
    adj_sims: Sequence[float],
    out_path: str,
    doc_id: str = "",
    valley_bounds: Optional[Sequence[int]] = None,
    c99_bounds: Optional[Sequence[int]] = None,
    final_bounds: Optional[Sequence[int]] = None,
    smoothed: Optional[Sequence[float]] = None,
    ideal_bounds: Optional[Sequence[int]] = None,
) -> Optional[str]:
    """Multi-panel signal plot: raw/smoothed adjacent sims + per-method cuts."""
    plt = _plt()
    if plt is None:
        return None
    adj = np.asarray(adj_sims, dtype=float)
    panels = [
        ("adjacent similarity", adj, smoothed),
        ("valley boundaries", adj, None),
        ("C99 boundaries", adj, None),
        ("final boundaries", adj, None),
    ]
    marks = [None, valley_bounds, c99_bounds, final_bounds]
    fig, axes = plt.subplots(len(panels), 1, figsize=(10, 9), sharex=True)
    for ax, (title, sig, extra), bnds in zip(axes, panels, marks):
        ax.plot(np.arange(1, sig.size + 1), sig, lw=0.9, label="adj sim")
        if extra is not None:
            ax.plot(np.arange(1, len(extra) + 1), extra, lw=0.9,
                    label="smoothed", alpha=0.7)
            ax.legend(loc="lower right", fontsize=7)
        for b in bnds or []:
            ax.axvline(b, color="red", lw=1.0, alpha=0.8)
        for b in ideal_bounds or []:
            ax.axvline(b, color="cyan", lw=0.8, linestyle="--", alpha=0.8)
        ax.set_ylabel(title, fontsize=8)
    axes[-1].set_xlabel("boundary index (between sentence i and i+1)")
    fig.suptitle(f"boundary signals — {doc_id}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_grouping_strip(
    labels: Sequence[int],
    out_path: str,
    doc_id: str = "",
) -> Optional[str]:
    """Color strip: one cell per sentence, colored by cluster id."""
    plt = _plt()
    if plt is None:
        return None
    lab = np.asarray(labels, dtype=int)
    fig, ax = plt.subplots(figsize=(10, 1.4))
    ax.imshow(lab[None, :], aspect="auto", cmap="tab20",
              interpolation="nearest")
    ax.set_yticks([])
    ax.set_xlabel("sentence index")
    ax.set_title(f"cluster membership — {doc_id}", fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def groups_to_labels(groups: Sequence[Sequence[int]], n: int) -> np.ndarray:
    labels = np.zeros(n, dtype=int)
    for cid, g in enumerate(groups):
        for i in g:
            if 0 <= i < n:
                labels[i] = cid
    return labels


def export_document_debug(
    doc_id: str,
    embeddings: np.ndarray,
    groups: Sequence[Sequence[int]],
    output_dir: str,
    bounds_dir: Optional[str] = None,
) -> Dict[str, Optional[str]]:
    """One-call export of all three visuals for a chunked document."""
    import jax.numpy as jnp

    from ..ops.similarity import adjacent_similarities, similarity_matrix

    os.makedirs(output_dir, exist_ok=True)
    emb = np.asarray(embeddings, np.float32)
    n = emb.shape[0]
    S = np.asarray(similarity_matrix(jnp.asarray(emb)))
    adj = np.asarray(adjacent_similarities(jnp.asarray(emb)))
    boundaries = sorted(g[0] for g in groups if g and g[0] > 0)
    ideal = load_ideal_bounds(bounds_dir, doc_id) if bounds_dir else None
    return {
        "heatmap": plot_similarity_heatmap(
            S, boundaries, os.path.join(output_dir, f"{doc_id}_heatmap.png"),
            doc_id, ideal_bounds=ideal,
        ),
        "signals": plot_boundary_signals(
            adj, os.path.join(output_dir, f"{doc_id}_signals.png"),
            doc_id, final_bounds=boundaries, ideal_bounds=ideal,
        ),
        "strip": plot_grouping_strip(
            groups_to_labels(groups, n),
            os.path.join(output_dir, f"{doc_id}_strip.png"), doc_id,
        ),
    }
