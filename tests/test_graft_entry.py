"""Driver-hook regression tests: __graft_entry__.entry() and
dryrun_multichip() run in subprocesses (they mutate global backend state)."""

import os
import pytest
import subprocess
import sys

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_py(code, extra_env=None, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_entry_compiles():
    out = run_py(
        "import __graft_entry__ as g, jax;"
        "fn, args = g.entry();"
        "o = jax.jit(fn)(*args);"
        "print('OK', o.shape)"
    )
    assert "OK (8, 8, 16, 16)" in out


def test_dryrun_multichip_8():
    out = run_py(
        "import __graft_entry__ as g; g.dryrun_multichip(8)",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert "ok" in out


def test_dryrun_multichip_odd_count():
    """Non-even device counts fall back to pure data parallelism."""
    out = run_py(
        "import __graft_entry__ as g; g.dryrun_multichip(3)",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=3"},
    )
    assert "'data': 3" in out and "ok" in out
