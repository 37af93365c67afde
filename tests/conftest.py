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

# Shared persistent compile cache with a zero min-compile threshold: the
# ~45 subprocess CLI tests (and suite reruns) reuse each other's CPU
# executables instead of recompiling identical XS/8 programs. The env vars
# are inherited by every subprocess the tests spawn; the entry scripts read
# them via mapdit_tpu.utils.compile_cache. Kept separate from the TPU cache
# directory so benchmark entries stay tidy.
os.environ.setdefault(
    "MAPDIT_COMPILE_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_compilation_tests"),
)
os.environ.setdefault("MAPDIT_COMPILE_CACHE_MIN_SECS", "0")

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

# In-process compiles cache too (pays off on suite reruns).
from mapdit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import pathlib
import subprocess
import sys

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
REPO = str(pathlib.Path(__file__).parent.parent)


@pytest.fixture(scope="session")
def trained_run(tmp_path_factory):
    """ONE tiny trained experiment shared by every CLI-driving test module
    (test_cli, test_serve, test_parallel) — training it once per session
    instead of per module saves ~1 min of 1-CPU suite wall time per extra
    consumer. DiT-XS/8, 10 classes, 12 steps, checkpoint at 12, EMA
    snapshots at 4/8/12 — keep assertions in sync when changing."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    ).strip()
    results = str(tmp_path_factory.mktemp("results"))
    proc = subprocess.run(
        [sys.executable, str(pathlib.Path(REPO) / "train.py"),
         "--data-path", "synthetic:64",
         "--results-dir", results,
         "--model", "DiT-XS/8",
         "--num-classes", "10",
         "--num-steps", "12",
         "--batch-size", "8",
         "--log-every", "4",
         "--ckpt-every", "12",
         "--ema-snapshot-every", "4",
         "--num-lin-warmup", "2",
         "--start-decay", "8"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"train: {proc.stdout}\n{proc.stderr}"
    return os.path.join(results, os.listdir(results)[0])


@pytest.fixture(scope="session")
def distilled_run(trained_run, tmp_path_factory):
    """A 2-stage progressive distillation of `trained_run` (8 -> 4 -> 2 step
    students, guidance baked at 1.5) shared by the distill CLI and serve
    tests. Returns the list of stage dirs (last = 2-step student)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    ).strip()
    results = str(tmp_path_factory.mktemp("distilled"))
    proc = subprocess.run(
        [sys.executable, str(pathlib.Path(REPO) / "distill.py"),
         "--teacher", trained_run,
         "--data-path", "synthetic:32",
         "--results-dir", results,
         "--base-steps", "8",
         "--stages", "2",
         "--steps-per-stage", "4",
         "--batch-size", "8",
         "--cfg-scale", "1.5",
         "--log-every", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"distill: {proc.stdout}\n{proc.stderr}"
    stage_dirs = [l for l in proc.stdout.splitlines() if os.path.isdir(l)]
    assert len(stage_dirs) == 2, proc.stdout
    return stage_dirs


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
