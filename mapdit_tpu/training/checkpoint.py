"""Checkpointing + resume.

The reference writes {model, opt} state dicts every --ckpt-every steps
(`train.py:124-132`) but has **no resume path** (SURVEY.md §5.3-4). Here the
full TrainState (params, constants, optimizer moments, both EMA trees, step,
rng) round-trips through flax msgpack — pytree checkpoints, no name
mangling (the reference's torch.compile `_orig_mod.` key bug class can't
exist, SURVEY.md §2.8) — and `latest_checkpoint` + `restore_state` give
train.py a --resume flag.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from flax import serialization


def checkpoint_path(exp_dir: str, step: int) -> str:
    return os.path.join(exp_dir, "checkpoints", f"{step:07d}.msgpack")


def save_state(exp_dir: str, step: int, state) -> str:
    import jax

    path = checkpoint_path(exp_dir, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # Atomic: a process killed mid-write must never leave a truncated
    # checkpoint behind (latest_checkpoint would pick it up and --resume
    # would die on "Unpack failed: incomplete input"). The .tmp name does
    # not match _CKPT_RE, so a dead partial write is invisible to resume.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, path)
    return path


class AsyncTreeWriter:
    """Background device-fetch + write for pytrees.

    ``submit(tree, write_fn)`` snapshots ``tree`` ON DEVICE with one jitted
    buffer copy (so the caller may keep donating/mutating the live arrays)
    and queues ``write_fn(host_tree)`` on a worker thread that does the
    device_get + write. Shared engine of :class:`AsyncMsgpackSaver` and
    train.py's EMA snapshots — through the axon relay the host fetch is
    the minutes-long stage, and it never belongs on the train loop.

    One worker, unbounded-but-joined queue; errors surface on the next
    submit()/close(). Device memory: one extra copy per queued snapshot —
    callers submit at checkpoint cadence, so at most ~one is in flight.
    """

    def __init__(self):
        self._thread = None
        self._copy_fn = None  # one jit; retraces per new list signature
        self._error = None
        self._outstanding = 0
        import threading

        self._lock = threading.Lock()

    def _snapshot(self, tree):
        import jax
        import jax.numpy as jnp

        leaves, treedef = jax.tree_util.tree_flatten(tree)
        arr_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
        if self._copy_fn is None:
            # one compiled call for ALL array leaves: per-leaf jnp.copy
            # would pay a relay dispatch round-trip per leaf
            self._copy_fn = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
        copied = self._copy_fn([leaves[i] for i in arr_idx])
        out = list(leaves)
        for i, c in zip(arr_idx, copied):
            out[i] = c
        return jax.tree_util.tree_unflatten(treedef, out)

    def check(self):
        """Surface a previous background-write failure NOW (raises it).
        Callers invoke this before logging a new save so an older
        checkpoint that silently never hit disk becomes a loud error at
        the next save, attributed to the async write — not swallowed by
        the new save's own fallback handling."""
        self._raise_pending()

    def snapshot(self, tree):
        """Public on-device snapshot (see _snapshot); callers that need to
        distinguish snapshot-allocation failures (fall back to a sync
        save) from write failures (loud) take this two-step path."""
        return self._snapshot(tree)

    def submit(self, tree, write_fn):
        self._raise_pending()
        self.submit_snapshot(self._snapshot(tree), write_fn)

    def submit_snapshot(self, snap, write_fn):
        import threading

        import jax

        with self._lock:
            backlog = self._outstanding
        if backlog >= 2:
            # Bound device memory: at most 2 snapshots in flight. A
            # BOUNDED wait — the relay's bulk-wedge mode (BENCH_NOTES
            # r05) parks device_get forever, and an unbounded join here
            # would re-freeze the train loop at a save far from the
            # wedged fetch. On timeout the save is SKIPPED with a
            # TimeoutError the caller can log-and-continue on.
            deadline = float(
                os.environ.get("MAPDIT_ASYNC_WRITER_WAIT_S", "900")
            )
            t = self._thread
            if t is not None:
                t.join(timeout=deadline)
                if t.is_alive():
                    raise TimeoutError(
                        "async writer backlogged: a background device "
                        f"fetch has not finished in {deadline:.0f}s "
                        "(wedged relay bulk path?) — skipping this save"
                    )
                self._thread = None
            self._raise_pending()
        with self._lock:
            self._outstanding += 1

        def _run(prev):
            if prev is not None:
                prev.join()
            try:
                write_fn(jax.device_get(snap))
            except BaseException as e:  # surfaced on next check()/close()
                self._error = e
            finally:
                with self._lock:
                    self._outstanding -= 1

        prev = self._thread
        self._thread = threading.Thread(
            target=_run, args=(prev,), daemon=True, name="tree-writer"
        )
        self._thread.start()

    def _raise_pending(self):
        if self._error is not None:
            e, self._error = self._error, None
            raise e

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        self._raise_pending()

    def close(self):
        self.wait()


class AsyncMsgpackSaver:
    """Non-blocking msgpack checkpointing (VERDICT r04 #3).

    The sync `save_state` stalls the train loop for the full host fetch —
    ~2 min per save through the axon relay (~600 MB device_get at
    ~5 MB/s; BENCH_NOTES r04 endurance leg spent ~10% of wall-clock
    saving). `save()` instead snapshots the state ON DEVICE (one jitted
    buffer copy, HBM-bandwidth) and writes the atomic msgpack file from a
    background thread via :class:`AsyncTreeWriter` — same on-disk format
    as `save_state` (restore_state reads both). The device snapshot
    transiently doubles state memory; if that allocation fails
    (XL-scale), the save falls back to the sync path.
    """

    def __init__(self):
        self._writer = AsyncTreeWriter()

    def save(self, exp_dir: str, step: int, state) -> str:
        # a FAILED previous write surfaces loudly here, attributed to the
        # async write of an OLDER step — it must never be eaten by this
        # step's fallback handling (the older file silently missing
        # while its save was already logged would poison --resume)
        self._writer.check()
        path = checkpoint_path(exp_dir, step)

        def _write(host_state):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(host_state))
            os.replace(tmp, path)

        try:
            snap = self._writer.snapshot(state)
        except MemoryError:
            return save_state(exp_dir, step, state)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e):
                # state copy does not fit next to the live state + optimizer
                # — degrade to the synchronous path rather than lose the
                # checkpoint
                return save_state(exp_dir, step, state)
            raise
        self._writer.submit_snapshot(snap, _write)
        return path

    def wait(self):
        self._writer.wait()

    def close(self):
        self._writer.close()


_CKPT_RE = re.compile(r"^(\d+)\.msgpack$")


def latest_checkpoint(exp_dir: str) -> Optional[str]:
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.match(f))
    ]
    return checkpoint_path(exp_dir, max(steps)) if steps else None


def restore_state(path: str, state_template):
    """Restore into a structurally-matching template (e.g. a freshly built
    TrainState) — shapes/dtypes validated by flax deserialization."""
    if os.path.isdir(path):
        return restore_state_orbax(path, state_template)
    with open(path, "rb") as f:
        return serialization.from_bytes(state_template, f.read())


# --------------------------------------------------------------------------- #
# orbax backend: async-capable, multi-host/sharded-aware production
# checkpointing (each checkpoint is a directory, not a single file).

def orbax_path(exp_dir: str, step: int) -> str:
    return os.path.join(exp_dir, "checkpoints", f"{step:07d}.orbax")


def save_state_orbax(exp_dir: str, step: int, state) -> str:
    import orbax.checkpoint as ocp

    path = orbax_path(exp_dir, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)
    return path


class AsyncOrbaxSaver:
    """Long-lived async checkpointer for the training loop.

    `save()` returns as soon as the state is snapshotted to host memory
    (orbax's async contract: buffers are safe to donate/mutate after save()
    returns); the directory write proceeds in a background thread, so the
    train loop never blocks on checkpoint IO. A subsequent save waits for
    the previous write; `close()` joins the last one. On multi-host pods
    every process must call save/close (collective barriers)."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def save(self, exp_dir: str, step: int, state) -> str:
        path = orbax_path(exp_dir, step)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._ckptr.save(os.path.abspath(path), state, force=True)
        return path

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.close()


def restore_state_orbax(path: str, state_template):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), state_template)


def latest_checkpoint_any(exp_dir: str) -> Optional[str]:
    """Newest checkpoint across both backends (msgpack file or orbax dir)."""
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    best_step, best = -1, None
    for f in os.listdir(ckpt_dir):
        m = re.match(r"^(\d+)\.(msgpack|orbax)$", f)
        if m and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), os.path.join(ckpt_dir, f)
    return best
