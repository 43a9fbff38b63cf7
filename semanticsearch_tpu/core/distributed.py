"""Multi-host process-group initialization.

The reference has no distributed backend (SURVEY.md §2b: IPC is pickled
DataFrames through process pools). Here, multi-host runs use one JAX process
group: call :func:`initialize` once per host before touching devices, then
build the global mesh with :func:`global_mesh` — XLA routes collectives over
ICI within a slice and DCN across slices.

Single-host (and the CI environment) skips initialization entirely, so every
code path works unchanged on one process.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from .logging import get_logger
from .mesh import MeshSpec, make_mesh

logger = get_logger("distributed")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the JAX process group; no-op for single-process runs.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods with the TPU runtime
    metadata available, bare ``jax.distributed.initialize()`` autodetects.
    Returns True when a multi-process group was joined.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "joined process group: process %s of %s",
        jax.process_index(), jax.process_count(),
    )
    return True


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val is not None else None


def global_mesh(spec: MeshSpec = MeshSpec()):
    """Mesh over all devices of all processes (call after initialize())."""
    return make_mesh(spec, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write artifacts/logs."""
    return jax.process_index() == 0
