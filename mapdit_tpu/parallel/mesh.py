"""Device mesh + sharding layout for data/tensor-parallel training.

TPU-native replacement for the reference's (absent) distributed tier
(SURVEY.md §2.7): a ``('data', 'model')`` `jax.sharding.Mesh` over ICI.

  * **data**: batch dim sharded; XLA GSPMD inserts the gradient psum.
  * **model**: optional tensor parallelism for the matmul-heavy weights —
    QKV / MLP-in weights are split on the output (head) dim, out-proj /
    MLP-out on the input dim, so each pair needs a single all-reduce on the
    branch output and the MP row-normalization stays shard-local (rows are
    never split).
  * **fsdp** (param_sharding(..., fsdp=True)): fully-sharded (ZeRO-3)
    params/optimizer/EMA over the *data* axis for XL-scale memory; composes
    with TP. No extra mesh axis — the data axis plays both roles, the
    standard JAX FSDP layout.

PP/SP/EP are intentionally absent: models are <=28 blocks on 64-256-token
sequences and fit on one chip (SURVEY.md §5.7); a sequence axis would attach
between 'data' and 'model' if inputs ever grew.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
axes here are laid out data-outermost so the gradient reduction rides ICI
within a slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model == devices.size, (n_data, n_model, devices.size)
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel layout: (out_dim, in_dim) weights.
# Column-parallel (split out rows): qkv_proj, mlp fc1 — rows stay whole so
# normalize() is shard-local. Row-parallel (split in cols): out_proj, fc2.
_COL_PARALLEL = ("qkv_proj", "fc1")
_ROW_PARALLEL = ("out_proj", "fc2")


def param_sharding(params, mesh: Mesh, fsdp: bool = False):
    """Pytree of NamedShardings: TP split for attention/MLP weights when the
    mesh has a nontrivial 'model' axis, replicated otherwise.

    ``fsdp=True`` additionally shards every weight matrix over the **data**
    axis (ZeRO-3 / fully-sharded layout): each device stores 1/n_data of the
    parameters, optimizer state and EMA trees; XLA GSPMD inserts the
    per-layer all-gathers in forward/backward and reduce-scatters the
    gradients. The out-rows dim is preferred so the forced-WN row
    normalization (`models/dit.py:project_weights`) stays shard-local; the
    in-cols dim is the fallback. Gather-indexed embedding tables are the
    exception: they stay **replicated** — sharding the feature dim of a
    table behind a `take` forces GSPMD into involuntary full
    rematerialization around the gather every step (spmd_partitioner
    warnings in the r02 dryrun), and the (1001, hidden) table is a few MB.
    The reference keeps its embedding replicated by construction
    (`src/basic/mp_embedding.py:8-24`).
    Composes with TP: a TP-split matrix gets the data axis on its free dim.

    Because optax's Adam mu/nu trees mirror the param dict (same key paths),
    this function can be applied to ``opt_state`` directly to co-shard
    optimizer moments (non-array leaves like ``count`` stay replicated).
    """
    tp = mesh.shape[MODEL_AXIS] > 1
    n_data = mesh.shape[DATA_AXIS]

    def rule(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if (
            getattr(leaf, "ndim", 0) in (2, 3)
            and names
            and names[-1] == "weight"
        ):
            # ndim 3 = scan_blocks depth-stacked weights: shard the same
            # matrix dims, one axis later.
            parent = names[-2] if len(names) >= 2 else ""
            if parent == "embedding":
                # gather-indexed table: replicate (see docstring)
                return NamedSharding(mesh, P())
            off = leaf.ndim - 2
            spec = [None] * leaf.ndim
            # t_embedder's MLP is tiny (hidden x hidden once, not per block);
            # keep it off TP *and* FSDP — sharding it makes the conditioning
            # vector inherit a feature-sharded layout that GSPMD then fully
            # rematerializes at the grad-accum scan boundary every iteration,
            # for ~zero memory savings.
            if "t_embedder" in names:
                return NamedSharding(mesh, P())
            if tp:
                if parent in _COL_PARALLEL and leaf.shape[off] % mesh.shape[MODEL_AXIS] == 0:
                    spec[off] = MODEL_AXIS
                elif parent in _ROW_PARALLEL and leaf.shape[off + 1] % mesh.shape[MODEL_AXIS] == 0:
                    spec[off + 1] = MODEL_AXIS
            if fsdp and n_data > 1:
                for dim in (off, off + 1):  # prefer out-rows (shard-local WN)
                    if spec[dim] is None and leaf.shape[dim] % n_data == 0:
                        spec[dim] = DATA_AXIS
                        break
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_tree(tree, shardings):
    """Device-put a pytree according to a matching pytree of shardings."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
