"""Fail fast when the accelerator backend never initializes.

The axon TPU tunnel's outage mode blocks ``jax.devices()`` forever with
no error (observed for 6+ hours straight): a training job, sampling run,
or server start launched against a dead tunnel hangs silently instead of
failing. Every CLI entry calls :func:`fail_fast_on_dead_backend` right
after startup: a watchdog thread exits the process (code 3) with a clear
stderr message if backend discovery hasn't completed within the budget.

``MAPDIT_BACKEND_TIMEOUT_S`` overrides the budget; ``0`` disables the
guard. On a healthy backend (CPU or tunneled TPU) discovery completes in
seconds, so the generous default never fires.
"""

from __future__ import annotations

import os


def fail_fast_on_dead_backend(
    timeout_s: float | None = None, label: str = "", discover=None
):
    """Run backend discovery under a watchdog; exit 3 on timeout.

    ``discover`` is the callable to guard — default ``jax.devices()``.
    Entries that call ``jax.distributed.initialize()`` MUST pass a
    callable doing init + discovery together: ``jax.devices()`` before
    the distributed init poisons the backend (jax raises), and a hung
    coordinator is a hang mode this guard should cover anyway.

    Returns ``discover()``'s result on success so callers can reuse it.
    No output is written to stdout on failure — a dead backend must never
    be mistaken for a (0-valued) measurement by log scrapers.
    """
    if discover is None:
        def discover():
            import jax

            return jax.devices()

    if timeout_s is None:
        timeout_s = float(os.environ.get("MAPDIT_BACKEND_TIMEOUT_S", "600"))
    if timeout_s <= 0:
        return discover()

    import sys
    import threading

    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(
                f"{label or 'mapdit'}: backend init did not complete within "
                f"{timeout_s:.0f}s — accelerator tunnel down? "
                "(JAX_PLATFORMS=cpu for a CPU run; "
                "MAPDIT_BACKEND_TIMEOUT_S=0 to disable this guard)",
                file=sys.stderr,
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=arm, daemon=True).start()
    try:
        return discover()
    finally:
        done.set()
