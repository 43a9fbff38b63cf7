"""Device-mesh construction for single-chip and multi-chip runs.

The reference has no device mesh — its only parallelism is host process pools
(``simple_chunk_controller.py:1205-1284``, ``rank_chunks_optimized.py:539-601``).
Here every parallel axis is a named axis of a ``jax.sharding.Mesh`` and XLA
collectives over ICI replace pickled-DataFrame IPC.

Axes convention:
  - ``data``  : batch / corpus-shard axis (pure data parallel; the default)
  - ``model`` : tensor-parallel axis (reserved; reranker models are small, so
                this is 1 almost everywhere, but the mesh plumbing supports it)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape over the available devices."""

    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def local_mesh() -> Mesh:
    """All local devices on the data axis — the common single-slice case."""
    return make_mesh(MeshSpec(data=-1, model=1))


def hybrid_mesh(
    n_slices: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Two-level mesh ("dcn", "data") for multi-slice deployments.

    The outer ``dcn`` axis crosses slice boundaries (data-center network);
    the inner ``data`` axis stays within a slice (ICI). On real multi-slice
    TPU hardware the device order from ``mesh_utils.create_hybrid_device_mesh``
    guarantees that; on virtual/CPU devices a plain reshape stands in (all
    links are equal there anyway).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices"
        )
    per_slice = len(devices) // n_slices
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (per_slice,), (n_slices,), devices=devices
        ).reshape(n_slices, per_slice)
    except Exception:
        dev_array = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(dev_array, axis_names=("dcn", "data"))


def data_sharding(mesh: Mesh, *trailing_none: int) -> NamedSharding:
    """Shard the leading axis over ``data``, replicate everything else."""
    spec = P("data", *([None] * max(0, trailing_none)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
