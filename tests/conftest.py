"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

This is the standard JAX substitute for a real multi-chip slice (SURVEY.md §4):
all sharding/mesh tests run against 8 virtual CPU devices, and the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU-tunnel plugin re-registers itself and rewrites
# jax_platforms at import time, overriding JAX_PLATFORMS; force CPU again
# post-import so tests always run on the 8-virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# The CI CPU backend defaults to reduced matmul precision; tests compare
# against f32 numpy references, so pin full precision here.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from semanticsearch_tpu.core.mesh import local_mesh

    return local_mesh()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
