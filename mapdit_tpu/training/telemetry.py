"""Magnitude-preservation telemetry (``train.py --log-magnitudes``).

The framework's defining property — the reason every layer is an MP layer
(reference README.md:3, EDM2 arXiv 2312.02696) — is that weights sit on the
unit-row-RMS manifold and activations hold ~unit RMS through depth. The
reference never instruments the property it is named for; this module makes
it a first-class training metric:

* :func:`weight_magnitudes` — per-leaf weight-row RMS deviation from 1 and
  learned-gain magnitudes, aggregated to scalars. Under forced WN
  (``project_weights``, models/dit.py:241-259) the deviation must be ~0 by
  construction after every step — the metric is a live invariant check. In
  vanilla (flags-off) mode it shows the drift MP training removes.
* :func:`make_activation_probe` — one jittable forward at mid-noise
  (t = T/2) on the current batch capturing every DiTBlock's residual-stream
  output, reporting per-depth RMS magnitude (the EDM2 "activation magnitude"
  plot as a training metric) plus the model-output RMS.

Both run once per log interval (negligible next to a train interval) and
stream into ``--metrics-jsonl`` rows; on a mesh they run as ordinary GSPMD
programs on the sharded state (every process executes, the lead writes).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mapdit_tpu.models.dit import DiT

Array = jax.Array


def weight_magnitudes(params) -> Dict[str, Array]:
    """Jittable scalar summary of the weight/gain magnitude state.

    Measures, over every ``weight`` leaf (ndim 2 per-block or 3 scan-stacked;
    storage is ``(out_dim, in_dim)``), the row RMS ``||w_i|| / sqrt(in_dim)``
    — the quantity :func:`mapdit_tpu.ops.mp.normalize` pins to 1 — and over
    every learned ``gain*`` scalar its magnitude (the modulation mix weights,
    init 0, reference ``src/blocks/dit_block.py:14-16``).
    """
    devs, gains = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [p.key for p in path if hasattr(p, "key")]
        if not names:
            continue
        if names[-1] == "weight" and leaf.ndim in (2, 3):
            rms = jnp.linalg.norm(leaf.astype(jnp.float32), axis=-1) / jnp.sqrt(
                jnp.asarray(leaf.shape[-1], jnp.float32)
            )
            devs.append(jnp.abs(rms - 1.0).reshape(-1))
        elif names[-1].startswith("gain"):
            gains.append(jnp.abs(leaf.astype(jnp.float32)).reshape(-1))
    out: Dict[str, Array] = {}
    if devs:
        d = jnp.concatenate(devs)
        out["w_rms_dev_mean"] = jnp.mean(d)
        out["w_rms_dev_max"] = jnp.max(d)
    if gains:
        g = jnp.concatenate(gains)
        out["gain_abs_mean"] = jnp.mean(g)
        out["gain_abs_max"] = jnp.max(g)
    return out


def _block_filter(mdl, method: str) -> bool:
    # name-substring: nn.remat/nn.scan wrap the class under a derived name
    return method == "__call__" and "DiTBlock" in type(mdl).__name__


def make_activation_probe(cfg, diffusion, stats_mean=None, stats_std=None):
    """Build ``probe(params, constants, batch, key) -> dict`` (jit it once).

    Draws the latent exactly as the train step does (posterior mu + eps*sigma
    normalized on device, or a pre-sampled ``x``), noises it to the chain
    midpoint t = T/2, and runs ONE eval-mode forward with flax
    ``capture_intermediates`` on the DiTBlock outputs. Returns

      * ``block_rms`` — (depth,) residual-stream RMS after each block
        (MP residuals at fixed t=0.3 should hold this ~1),
      * ``out_rms`` — RMS of the model output's eps channels,
      * ``cond_rms`` — RMS of the input embedding stream entering block 0
        is NOT separately captured; block_rms[0] already reflects it.
    """
    model = DiT(cfg)
    depth = cfg.depth

    def probe(params, constants, batch, key: Array) -> Dict[str, Array]:
        if "x" in batch:
            x = batch["x"]
        else:
            eps = jax.random.normal(key, batch["mean"].shape, batch["mean"].dtype)
            x = batch["mean"] + eps * batch["std"]
            x = (x - stats_mean.reshape(1, -1, 1, 1)) / stats_std.reshape(1, -1, 1, 1)
        n = x.shape[0]
        t = jnp.full((n,), diffusion.num_timesteps // 2, jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(key, 1), x.shape, x.dtype)
        x_t = diffusion.q_sample(x, t, noise)
        out, mut = model.apply(
            {"params": params, "constants": constants},
            x_t,
            t,
            batch["y"],
            train=False,
            capture_intermediates=_block_filter,
            mutable=["intermediates"],
        )

        def rms(a):
            return jnp.sqrt(jnp.mean(jnp.square(a.astype(jnp.float32))))

        # Captured values: under scan_blocks ONE depth-stacked (depth,N,T,D)
        # sow under 'blocks' (scan_mode returns (x, None); None drops out of
        # the tree); otherwise one (N,T,D) sow per 'blocks_i' — extracted by
        # path name, not tree order (dict order is lexicographic: blocks_10
        # would sort before blocks_2).
        def first_leaf(v):
            return jax.tree_util.tree_leaves(v)[0]

        inter = mut["intermediates"]
        if "blocks" in inter:
            block_rms = jax.vmap(rms)(first_leaf(inter["blocks"]))
        else:
            block_rms = jnp.stack(
                [rms(first_leaf(inter[f"blocks_{i}"])) for i in range(depth)]
            )
        return {
            "block_rms": block_rms,
            "out_rms": rms(out[:, : cfg.in_channels]),
        }

    return probe
