"""Distributed helpers: single-process no-op + global mesh construction."""
from semanticsearch_tpu.core.distributed import global_mesh, initialize, is_primary
from semanticsearch_tpu.core.mesh import MeshSpec


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize() is False  # no group to join; everything still works


def test_global_mesh_and_primary():
    mesh = global_mesh(MeshSpec(data=-1, model=1))
    assert mesh.shape["data"] >= 1
    assert is_primary() is True
