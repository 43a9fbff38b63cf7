"""Checkpoint save/restore for params + optimizer state + step.

The reference only checkpoints final model artifacts (``trainer.save_model()``
+ ``preprocessor.save()``, ``MatchZoo_Tool/train_controller.py:497-498``) and
reconstructs architecture from tensor shapes at load time
(``evaluate_models.py:162-186``). Here we checkpoint the full train state
(params, optimizer state, step) with orbax so runs are resumable mid-training,
plus a small JSON sidecar for config provenance.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_pytree_of_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async checkpoint save has committed.

    Call before relying on checkpoint durability (end of training, before
    process exit). No-op when no async saves were issued.
    """
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None,
                    async_save: bool = False) -> str:
    """Save a pytree checkpoint. Uses orbax when available, else a .npz flat dump.

    ``async_save=True`` returns as soon as the device arrays are snapshotted
    to host; the disk write proceeds in a background thread (orbax
    AsyncCheckpointer) so the train loop overlaps I/O with the next steps.
    Call :func:`wait_for_checkpoints` before depending on the file.
    """
    os.makedirs(path, exist_ok=True)
    fmt = "orbax"
    try:
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.join(os.path.abspath(path), "state")
        if async_save:
            ckptr = _async_checkpointer()
            ckptr.save(ckpt_dir, _to_pytree_of_numpy(state), force=True)
        else:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(ckpt_dir, _to_pytree_of_numpy(state), force=True)
            ckptr.wait_until_finished()
    except Exception:
        fmt = "npz"
        flat, treedef = jax.tree.flatten(state)
        np.savez(
            os.path.join(path, "state.npz"),
            *[np.asarray(x) for x in flat],
        )
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    # Record which format THIS save completed with (tmp + replace: atomic).
    # restore must follow the LATEST save: preferring any existing orbax
    # state/ dir would silently restore a stale orbax save written before
    # a later save that fell back to npz (e.g. under disk pressure).
    fmt_tmp = os.path.join(path, "format.json.tmp")
    with open(fmt_tmp, "w") as f:
        json.dump({"format": fmt}, f)
    os.replace(fmt_tmp, os.path.join(path, "format.json"))
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree checkpoint saved by :func:`save_checkpoint`.

    ``target`` provides the pytree structure (and shapes for orbax).
    """
    state_dir = os.path.join(os.path.abspath(path), "state")
    # honor the format of the LATEST completed save (format.json, written
    # atomically after each save): an orbax state/ dir may be STALE next to
    # a newer npz written by a fallback save. Older checkpoints without the
    # marker keep the orbax-first preference.
    fmt = None
    fmt_path = os.path.join(path, "format.json")
    if os.path.exists(fmt_path):
        try:
            with open(fmt_path) as f:
                fmt = json.load(f).get("format")
        except (OSError, ValueError):
            fmt = None
    if fmt != "npz" and os.path.isdir(state_dir):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), target
        )
        return ckptr.restore(state_dir, abstract)
    npz = np.load(os.path.join(path, "state.npz"))
    flat, treedef = jax.tree.flatten(target)
    restored = [npz[f"arr_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, restored)


def load_metadata(path: str) -> Optional[Dict]:
    meta_path = os.path.join(path, "metadata.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)
