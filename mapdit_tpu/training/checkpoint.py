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
