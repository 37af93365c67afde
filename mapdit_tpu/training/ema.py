"""Karras power-function post-hoc EMA (reference `src/ema.py`).

Profile math (std<->gamma, per-step beta, profile inner products, the
least-squares snapshot reconstruction) is pure numpy and host-side. The
per-step EMA *update* runs inside the jitted train step: EMA parameter trees
live in the train state and are lerped with a beta computed from the step
counter on device (gamma is a per-std compile-time constant).

Snapshots are fp16 ``.npz`` files named ``<std:.3f>_<step:07d>.npz`` —
the reference's ``<std>_<step>.pt`` ledger (`ema.py:142-155`) with a
framework-neutral container. `calculate_posthoc_ema` reconstructs an EMA of
*any* std after training from the ledger (reference `ema.py:68-114`).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------- #
# profile math (numpy, float64) — arXiv 2312.02696 appendix

def std_to_gamma(std) -> np.ndarray:
    """Solve std^-2 = (gamma+1)/((gamma+2)^2 (gamma+3)) for the largest real
    root of the cubic gamma^3 + 7 gamma^2 + (16 - s) gamma + (12 - s) = 0."""
    std = np.asarray(std, dtype=np.float64)
    s = std.reshape(-1) ** -2.0
    gamma = np.array(
        [np.roots([1.0, 7.0, 16.0 - si, 12.0 - si]).real.max() for si in s]
    )
    return gamma.reshape(std.shape)


def gamma_to_std(gamma) -> np.ndarray:
    gamma = np.asarray(gamma, dtype=np.float64)
    return np.sqrt((gamma + 1.0) / (np.square(gamma + 2.0) * (gamma + 3.0)))


def calc_beta(std, t):
    """Per-step decay beta_t = (1 - 1/t)^(gamma+1) for the power EMA profile."""
    gamma = std_to_gamma(np.asarray(std))
    return (1.0 - 1.0 / t) ** (gamma + 1.0)


def p_dot_p(t_a, gamma_a, t_b, gamma_b):
    """Inner products of power-EMA profiles at snapshot times."""
    t_ratio = t_a / t_b
    t_exp = np.where(t_a < t_b, gamma_b, -gamma_a)
    t_max = np.maximum(t_a, t_b)
    num = (gamma_a + 1.0) * (gamma_b + 1.0) * t_ratio**t_exp
    return num / ((gamma_a + gamma_b + 1.0) * t_max)


def solve_weights(t_i, gamma_i, t_r, gamma_r) -> np.ndarray:
    """Least-squares weights reconstructing the target profile from the
    snapshot profiles (reference `ema.py:56-65`)."""
    rv = lambda x: np.asarray(x, np.float64).reshape(-1, 1)
    cv = lambda x: np.asarray(x, np.float64).reshape(1, -1)
    A = p_dot_p(rv(t_i), rv(gamma_i), cv(t_i), cv(gamma_i))
    B = p_dot_p(rv(t_i), rv(gamma_i), cv(t_r), cv(gamma_r))
    return np.linalg.solve(A, B)


# --------------------------------------------------------------------------- #
# in-train-state EMA update (device-side)

def make_beta_fn(std: float):
    """beta(step) as a jnp expression of the (1-indexed) train step; gamma is
    baked as a compile-time constant."""
    gamma = float(std_to_gamma(std))

    def beta_fn(step: Array) -> Array:
        t = jnp.maximum(step.astype(jnp.float32), 1.0)
        return (1.0 - 1.0 / t) ** (gamma + 1.0)

    return beta_fn


def ema_update(ema_params, model_params, beta: Array):
    """ema <- ema + beta (model - ema): lerp toward the current model.

    Matches the reference's ``param.lerp_(model_param, beta)``
    (`ema.py:125-140`) — note beta weights the *model*, so beta(1)=0 copies
    the model at step 1.
    """
    return jax.tree_util.tree_map(
        lambda e, p: e + (p.astype(e.dtype) - e) * beta, ema_params, model_params
    )


# --------------------------------------------------------------------------- #
# snapshot ledger (host-side IO)

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_snapshot(ema_dir: str, std: float, step: int, params) -> str:
    """Write one fp16 snapshot (reference `ema.py:142-155` format role)."""
    os.makedirs(ema_dir, exist_ok=True)
    flat = {k: v.astype(np.float16) for k, v in _flatten(jax.device_get(params)).items()}
    path = os.path.join(ema_dir, f"{std:.3f}_{step:07d}.npz")
    # Atomic (tmp does not match _SNAP_RE): a truncated snapshot would
    # poison every posthoc reconstruction that scans the ledger.
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    return path


_SNAP_RE = re.compile(r"^([0-9]*\.[0-9]+)_(\d+)\.(npz|pt)$")


def list_snapshots(ema_dir: str) -> List[Tuple[float, int, str]]:
    """Ledger scan: native ``.npz`` snapshots and reference ``.pt`` ones
    (`src/ema.py:142-155` filename format) are both recognized, so a
    reference training run is post-hoc-sampleable in place."""
    out, seen = [], set()
    # sorted() puts .npz before .pt, so when the same (std, step) exists in
    # both formats (e.g. after export-ema into the same dir) the native
    # snapshot wins — duplicates would make the least-squares Gram matrix
    # singular.
    for f in sorted(os.listdir(ema_dir)):
        m = _SNAP_RE.match(f)
        if m:
            key = (float(m.group(1)), int(m.group(2)))
            if key in seen:
                continue
            seen.add(key)
            out.append((key[0], key[1], os.path.join(ema_dir, f)))
    return out


def load_snapshot(path: str) -> dict:
    """Load one snapshot as a params pytree. ``.pt`` entries are reference
    ledger files ``{std, t, state_dict}`` (`src/ema.py:142-155`, fp16,
    torch.compile-prefixed keys) mapped through the torch-import renamer."""
    if path.endswith(".pt"):
        import torch

        from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

        d = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: np.asarray(v) for k, v in d["state_dict"].items()}
        return jax.tree_util.tree_map(
            np.asarray, variables_from_torch_state_dict(sd)["params"]
        )
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


def calculate_posthoc_ema(out_std: float, ema_dir: str, verbose: bool = True) -> dict:
    """Reconstruct EMA params at an arbitrary std from the snapshot ledger
    via least squares over profile inner products (reference `ema.py:68-114`).
    Returns a float32 param pytree.
    """
    snaps = list_snapshots(ema_dir)
    assert snaps, f"No EMA snapshots found in {ema_dir}"
    in_stds = np.array([s for s, _, _ in snaps])
    in_ts = np.array([t for _, t, _ in snaps])
    out_ts = int(in_ts.max())

    # Exact match shortcut (reference `ema.py:92-98`)
    exact = (in_stds == out_std) & (in_ts == out_ts)
    if exact.any():
        tree = load_snapshot(snaps[int(np.argmax(exact))][2])
        return jax.tree_util.tree_map(lambda a: a.astype(np.float32), tree)

    in_gammas = std_to_gamma(in_stds)
    weights = solve_weights(in_ts, in_gammas, np.array([float(out_ts)]), std_to_gamma(out_std))
    weights = weights.flatten()

    acc: dict = None
    for w, (_, _, path) in zip(weights, snaps):
        tree = load_snapshot(path)
        if acc is None:
            acc = jax.tree_util.tree_map(lambda a: a.astype(np.float32) * w, tree)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(np.float32) * w, acc, tree
            )
    return acc
