"""The DiT model (reference `src/dit.py`) and functional weight projection.

TPU-native design notes:
  * Pure functional module — parameters never mutate during apply. The
    reference's forced weight normalization (in-place, every training
    forward, `src/basic/mp_linear.py:38-40`) becomes
    :func:`project_weights`, applied once per optimizer step in the jitted
    train step. Because the in-graph "traditional" WN always renormalizes
    before use, the forward math is identical either way; only the optimizer
    geometry (Adam moments on a normalized iterate) depends on projection.
  * The positional table is computed host-side in float64 and baked into the
    jitted graph as a constant (reference registers a buffer,
    `src/dit.py:46-48`).
  * ``forward_with_cfg`` reproduces the GLIDE-style batched CFG split
    (`src/dit.py:107-118`) and is scan-safe (shapes static).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mapdit_tpu.models.blocks import DiTBlock, FinalLayer, LabelEmbedder, TimestepEmbedder
from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.models.layers import MPLinear
from mapdit_tpu.ops.mp import mp_sum, normalize
from mapdit_tpu.ops.patch import patchify, unpatchify
from mapdit_tpu.ops.pos_embed import get_2d_sincos_pos_embed

Array = jax.Array


class DiT(nn.Module):
    """Diffusion Transformer with magnitude-preserving variants.

    ``apply(variables, x, t, y, train=..., rngs={'label_dropout': ...})``
    where x: (N, C, H, W), t: (N,) float timesteps, y: (N,) int labels.
    Returns (N, 2C, H, W) when learn_sigma else (N, C, H, W).
    """

    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        y: Array,
        train: bool = False,
        force_drop_ids: Optional[Array] = None,
        span: Optional[tuple] = None,
        cached_delta: Optional[Array] = None,
        return_delta: bool = False,
        block_stack: Optional[dict] = None,
    ) -> Array:
        """Standard forward, plus the opt-in block-span cache protocol for
        Delta-DiT-style sampling acceleration (arXiv 2406.01125; see
        `mapdit_tpu/runtime.py:build_cached_sample_fn`):

          * ``span=(i, j), return_delta=True`` — full forward that also
            returns the span's token-state displacement
            ``delta = x_after_block_j - x_before_block_i``.
          * ``span=(i, j), cached_delta=delta`` — partial forward: blocks
            [i, j) are replaced by ``x += delta`` (the Delta-DiT
            approximation: a span's displacement field drifts slowly across
            adjacent timesteps), skipping their compute entirely.

        With both None (the default) the forward is exactly the reference
        path — golden-tested behavior is untouched.
        """
        cfg = self.cfg
        n = x.shape[0]

        x = patchify(x, cfg.patch_size).astype(cfg.dtype)

        pos = get_2d_sincos_pos_embed(cfg.hidden_size, cfg.input_size // cfg.patch_size)
        pos = jnp.asarray(pos, jnp.float32)

        if cfg.use_weight_normalization:
            # Bias-free MP design: appended ones column acts as input bias
            # (reference `src/dit.py:37-41, 81-82`). Identical math, two
            # lowerings (the r03 VERDICT's "ones-column GEMM fusion" edge):
            #   concat  — materialize the (N, T, P+1) concat and run one GEMM
            #             (the reference's own formulation; P=16 -> 17 lanes
            #             is an unaligned-lane relayout on TPU);
            #   fused   — x @ W[:, :-1].T + W[:, -1]: the ones column IS a
            #             bias row, so split the normalized weight instead of
            #             padding the activation. Parameters, checkpoints and
            #             gradients are identical (split happens after the
            #             row-normalize).
            # Chip A/B at the S/2 250-step headline (r04, back-to-back):
            # concat 653.5 steps/s vs fused 647.6 — the fusion idea is
            # REFUTED at these shapes (XLA already folds the tiny concat
            # into the padded GEMM; the split form loses the 17-lane pad
            # but adds a broadcast add). Concat stays the default;
            # MAPDIT_FUSE_INPUT_BIAS=1 keeps the A/B surface.
            import math as _math
            import os as _os

            emb = MPLinear(
                x.shape[-1] + 1,
                cfg.hidden_size,
                use_wn=True,
                folded=cfg.fold_weights,
                dtype=cfg.dtype,
                name="x_embedder",
            )
            if _os.environ.get("MAPDIT_FUSE_INPUT_BIAS", "0") == "1":
                w = emb.effective_weight() * (1.0 / _math.sqrt(emb.in_dim))
                w = w.astype(cfg.dtype)
                x = x.astype(cfg.dtype) @ w[:, :-1].T + w[:, -1]
            else:
                x = jnp.concatenate(
                    [x, jnp.ones_like(x[:, :, :1])], axis=-1
                )
                x = emb(x)
        else:
            x = MPLinear(
                x.shape[-1],
                cfg.hidden_size,
                use_wn=False,
                folded=cfg.fold_weights,
                dtype=cfg.dtype,
                name="x_embedder",
            )(x)

        if cfg.use_mp_pos_enc:
            x = mp_sum(x, normalize(pos)[None].astype(cfg.dtype), t=0.5)
        else:
            x = x + pos[None].astype(cfg.dtype)

        t_emb = TimestepEmbedder(cfg, name="t_embedder")(t)
        y_emb = LabelEmbedder(cfg, name="y_embedder")(y, train, force_drop_ids)
        c = mp_sum(t_emb, y_emb, t=0.5) if cfg.mp_style else t_emb + y_emb

        if block_stack is not None:
            # Whole-stack Pallas megakernel (block_kernel="mega_stack"):
            # all depth blocks in ONE pallas_call, residual stream resident
            # in VMEM scratch across the stack, per-block weights streamed
            # behind compute. The caller (runtime.build_shared_sample_fn's
            # prepare()) stacks the FOLDED effective weights once outside
            # the sampling scan; the blocks_* params are untouched here.
            assert span is None, "block-span caching composes with the per-block kernels only"
            from mapdit_tpu.models.layers import activation
            from mapdit_tpu.ops.pallas.dit_block import fused_dit_stack

            x = fused_dit_stack(
                x.astype(cfg.dtype),
                activation(c, cfg).astype(cfg.dtype),
                block_stack["gains"],
                block_stack["w_mod"],
                block_stack["w_qkv"],
                block_stack["w_out"],
                block_stack["w1"],
                block_stack["w2"],
                cfg.num_heads,
            )
            out = FinalLayer(cfg, name="final_layer")(x, c)
            if cfg.learn_sigma:
                mean, sigma = out
                return jnp.concatenate(
                    [
                        unpatchify(mean, cfg.input_size, cfg.patch_size),
                        unpatchify(sigma, cfg.input_size, cfg.patch_size),
                    ],
                    axis=1,
                ).astype(jnp.float32)
            return unpatchify(out, cfg.input_size, cfg.patch_size).astype(
                jnp.float32
            )

        block_cls = nn.remat(DiTBlock) if cfg.remat else DiTBlock
        if span is not None:
            assert not cfg.scan_blocks, "block-span caching needs scan_blocks=False"
            lo, hi = span
            assert 0 <= lo <= hi <= cfg.depth, span
            for i in range(lo):
                x = block_cls(cfg, name=f"blocks_{i}")(x, c)
            if cached_delta is not None:
                x = x + cached_delta
                delta = cached_delta
            else:
                x_before = x
                for i in range(lo, hi):
                    x = block_cls(cfg, name=f"blocks_{i}")(x, c)
                delta = x - x_before
            for i in range(hi, cfg.depth):
                x = block_cls(cfg, name=f"blocks_{i}")(x, c)
            out = FinalLayer(cfg, name="final_layer")(x, c)
            if cfg.learn_sigma:
                mean, sigma = out
                out = jnp.concatenate(
                    [
                        unpatchify(mean, cfg.input_size, cfg.patch_size),
                        unpatchify(sigma, cfg.input_size, cfg.patch_size),
                    ],
                    axis=1,
                ).astype(jnp.float32)
            else:
                out = unpatchify(out, cfg.input_size, cfg.patch_size).astype(jnp.float32)
            return (out, delta) if return_delta else out

        if cfg.scan_blocks:
            # Compile ONE block and lax.scan over depth-stacked params:
            # graph size (and compile time) per model drops ~depth-fold —
            # the difference between DiT-XL/2 compiling in minutes vs tens
            # of minutes through remote compile. Params live stacked as
            # blocks/<leaf> with a leading (depth,) axis; see
            # stack_block_params / unstack_block_params for converting
            # per-block checkpoints.
            scan_cls = nn.scan(
                block_cls,
                # 'intermediates' axis: lets capture_intermediates (magnitude
                # telemetry, training/telemetry.py) stack per-depth sows; inert
                # unless the caller requests the collection.
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=cfg.depth,
            )
            x, _ = scan_cls(cfg, scan_mode=True, name="blocks")(x, c)
        else:
            for i in range(cfg.depth):
                x = block_cls(cfg, name=f"blocks_{i}")(x, c)

        out = FinalLayer(cfg, name="final_layer")(x, c)
        if cfg.learn_sigma:
            mean, sigma = out
            return jnp.concatenate(
                [
                    unpatchify(mean, cfg.input_size, cfg.patch_size),
                    unpatchify(sigma, cfg.input_size, cfg.patch_size),
                ],
                axis=1,
            ).astype(jnp.float32)
        return unpatchify(out, cfg.input_size, cfg.patch_size).astype(jnp.float32)

    def forward_with_cfg(
        self,
        x: Array,
        t: Array,
        y: Array,
        cfg_scale,
        span: Optional[tuple] = None,
        cached_delta: Optional[Array] = None,
        return_delta: bool = False,
        block_stack: Optional[dict] = None,
    ) -> Array:
        """Batched classifier-free guidance (reference `src/dit.py:107-118`).

        The first half of x is the real batch; labels carry [cond; null].
        Only the eps channels are guided; sigma channels pass through.
        The span/cached_delta/return_delta protocol passes through to
        :meth:`__call__` (delta batch = the combined [cond; uncond] batch).
        """
        c = self.cfg
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self(
            combined, t, y,
            span=span, cached_delta=cached_delta, return_delta=return_delta,
            block_stack=block_stack,
        )
        delta = None
        if return_delta:
            model_out, delta = model_out
        eps, rest = model_out[:, : c.in_channels], model_out[:, c.in_channels :]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        out = jnp.concatenate([eps, rest], axis=1)
        return (out, delta) if return_delta else out


def project_weights(params, cfg: DiTConfig):
    """Row-normalize all weight-normalized matrices (forced WN, functional).

    Equivalent fixed point of the reference's in-forward mutation: stored
    weights are re-projected onto the norm-sqrt(in_dim) manifold after each
    optimizer update. Applied only when both WN flags are on.
    """

    def proj(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if not names or names[-1] != "weight" or leaf.ndim not in (2, 3):
            return leaf  # ndim 3 = scan_blocks depth-stacked weights
        is_embedding = len(names) >= 2 and names[-2] == "embedding"
        flag = cfg.use_mp_embedding if is_embedding else cfg.use_weight_normalization
        if flag and cfg.use_forced_weight_normalization:
            return normalize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(proj, params)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def init_model(cfg: DiTConfig, seed: int = 0):
    """Initialize (model, variables). `variables` holds 'params' and
    'constants' (MPFourier buffers) collections."""
    model = DiT(cfg)
    x = jnp.zeros((1, cfg.in_channels, cfg.input_size, cfg.input_size), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    y = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), x, t, y)
    return model, variables


def stack_block_params(params: dict, depth: int) -> dict:
    """Convert per-block params (blocks_0..blocks_{D-1}) to the scan_blocks
    layout: one 'blocks' subtree with a leading (depth,) axis on every leaf."""
    import numpy as _np

    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    out["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    return out


def unstack_block_params(params: dict, depth: int) -> dict:
    """Inverse of stack_block_params."""
    out = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree_util.tree_map(lambda x: x[i], params["blocks"])
    return out
