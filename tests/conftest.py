"""Test harness configuration.

Unit tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the same trick real JAX frameworks use for
"multi-node without a cluster" — see SURVEY.md §4).  The real-TPU benchmark
path is exercised separately by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize forces jax_platforms="axon,cpu" at interpreter
# startup; override it back to CPU before any backend initializes so unit
# tests never touch the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

# Scene/texture fixtures: the reference checkout's data/ tree, relocatable
# via CHESS2RT_DATA_DIR (same env var the app honors, raytracer_demo.d:27).
REFERENCE_DATA = pathlib.Path(os.environ.get("CHESS2RT_DATA_DIR", "/root/reference/data"))


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip(f"scene data dir not found: {REFERENCE_DATA} (set CHESS2RT_DATA_DIR)")
    return REFERENCE_DATA
