"""Core tests: config tree, named registry, checkpoint roundtrip, mesh."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from semanticsearch_tpu.core.checkpoint import (
    load_metadata,
    restore_checkpoint,
    save_checkpoint,
)
from semanticsearch_tpu.core.config import (
    Config,
    NAMED_CONFIGS,
    get_named_config,
)
from semanticsearch_tpu.core.mesh import MeshSpec, make_mesh
from semanticsearch_tpu.core.profiling import StepTimer


def test_config_override_nested():
    cfg = Config()
    out = cfg.override(chunking={"method": "grouping"}, seed=7)
    assert out.chunking.method == "grouping" and out.seed == 7
    assert cfg.chunking.method == "splitter"  # frozen original untouched
    with pytest.raises(KeyError):
        cfg.override(chunking={"not_a_field": 1})


def test_named_configs_registered():
    for name in ("semantic_splitter", "semantic_grouping", "text_splitter_char",
                 "semantic_splitter_dp", "semantic_grouping_modularity"):
        assert name in NAMED_CONFIGS
        assert get_named_config(name).name == name
    with pytest.raises(KeyError):
        get_named_config("nope")


def test_config_json_roundtrippable():
    import json

    blob = json.loads(Config().to_json())
    assert blob["chunking"]["method"] == "splitter"


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(5),
    }
    save_checkpoint(str(tmp_path / "ckpt"), state, metadata={"model": "test"})
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(np.asarray(restored["step"])) == 5
    assert load_metadata(str(tmp_path / "ckpt"))["model"] == "test"


def test_mesh_spec(mesh8):
    assert mesh8.shape["data"] == 8 and mesh8.shape["model"] == 1
    spec = MeshSpec(data=4, model=2)
    mesh = make_mesh(spec)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        MeshSpec(data=3, model=2).resolve(8)


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
