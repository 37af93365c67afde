"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first `import jax` anywhere in the test process — pytest
imports conftest.py before collecting test modules, which guarantees that.
This is the standard JAX fake-backend idiom for exercising the real
mesh/sharding code paths without TPU hardware (SURVEY.md §4.5).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms via jax.config (which outranks the env var). Override it
# back to CPU and drop any initialized backends so the 8-device virtual CPU
# mesh takes effect.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Load a golden npz dumped from the PyTorch reference by tools/make_goldens.py."""

    def _load(name: str) -> dict:
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name}.npz not generated")
        with np.load(path, allow_pickle=False) as f:
            return {k: f[k] for k in f.files}

    return _load
