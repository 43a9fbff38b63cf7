"""Tensor parallelism for the sentence encoder over the mesh ``model`` axis.

The reference has no tensor parallelism anywhere (SURVEY §2b: its only
parallelism is host process pools). This module is the TPU-native TP story
for the one model family large enough to ever need it — the transformer
encoder — done the idiomatic XLA way: parameters are laid out with
Megatron-style PartitionSpecs over the ``model`` mesh axis and handed to
``jax.jit``; the SPMD partitioner propagates the shardings through the
forward/backward graph and inserts the all-reduces itself. No manual
``psum`` calls, no model-code changes — the same ``SentenceTransformerModel``
runs 1-device, data-parallel, or (data x model)-parallel purely by parameter
placement.

Layout (the standard two-collective-per-block scheme):

  - attention Q/K/V kernels  (hidden, heads, head_dim): heads over ``model``
    -> each device computes its head slice end to end;
  - attention out kernel     (heads, head_dim, hidden): contracting (head)
    axis over ``model`` -> partial sums, XLA inserts one all-reduce;
  - MLP up kernel            (hidden, mlp): mlp columns over ``model``;
  - MLP down kernel          (mlp, hidden): contracting axis over ``model``
    -> the block's second all-reduce;
  - embeddings / LayerNorms / biases of row-sharded matmuls: replicated
    (at encoder scale they are a rounding error next to the matmuls).

Gradients, optimizer state, and updates inherit the same layout inside the
jitted train step, so contrastive training (``train/encoder_train.py``) is
TP-transparent: its ``jax.value_and_grad`` + optax update compile into a
sharded step with gradient all-reduces over ``data`` x activation
all-reduces over ``model``.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger

logger = get_logger("tensor_parallel")


def mesh_tp_size(mesh: Mesh | None) -> int:
    """Tensor-parallel degree of a mesh (1 when no ``model`` axis)."""
    if mesh is None or "model" not in mesh.axis_names:
        return 1
    return int(mesh.shape["model"])


def tp_compatible(cfg: Any, tp: int) -> bool:
    """A config can shard over ``tp`` devices iff the head and MLP axes
    divide evenly — otherwise shards would be ragged (unsupported by XLA
    tiling) and we fall back to replication."""
    return tp > 1 and cfg.num_heads % tp == 0 and cfg.mlp_dim % tp == 0


def _spec_for_path(path, leaf) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    grand = names[-3] if len(names) >= 3 else ""
    if grand.startswith("MultiHeadDotProductAttention"):
        if parent in ("query", "key", "value"):
            # kernel (hidden, heads, head_dim) / bias (heads, head_dim)
            return (P(None, "model", None) if leaf_name == "kernel"
                    else P("model", None))
        if parent == "out":
            # kernel (heads, head_dim, hidden): contracting axis sharded ->
            # XLA emits the block's attention all-reduce; bias replicated
            return P("model", None, None) if leaf_name == "kernel" else P()
    if parent == "Dense_0":  # MLP up: column-sharded, bias follows columns
        return P(None, "model") if leaf_name == "kernel" else P("model")
    if parent == "Dense_1":  # MLP down: row(contracting)-sharded
        return P("model", None) if leaf_name == "kernel" else P()
    return P()  # embeddings, LayerNorms, final projections: replicated


def encoder_param_specs(params) -> Any:
    """PartitionSpec tree for a ``SentenceTransformerModel`` parameter tree."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def shard_encoder_params(params, mesh: Mesh, cfg: Any):
    """Place an encoder parameter tree on ``mesh`` with the TP layout.

    Falls back to full replication (with a warning) when the config's head
    or MLP width does not divide the ``model`` axis — the model still runs,
    just without tensor parallelism.
    """
    tp = mesh_tp_size(mesh)
    if not tp_compatible(cfg, tp):
        if tp > 1:
            logger.warning(
                "encoder config (heads=%d, mlp=%d) does not divide the "
                "model axis (%d): replicating parameters instead of TP",
                cfg.num_heads, cfg.mlp_dim, tp,
            )
        return jax.device_put(params, NamedSharding(mesh, P()))
    specs = encoder_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )
