"""Sampling runtime: build jitted end-to-end denoising functions.

One XLA program runs the entire respaced chain (scan over timesteps, model
forward + ancestral step fused per iteration). With ``fold=True`` the
weight-normalized matrices are pre-projected once and the in-graph
re-normalization is skipped inside the scan (see DiTConfig.fold_weights).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.models.dit import DiT
from mapdit_tpu.ops.mp import normalize

Array = jax.Array


def fold_weights_for_inference(params, cfg: DiTConfig):
    """Normalize every weight-normalized matrix once so apply() can skip the
    in-graph normalization (exact up to the normalize eps fixed point)."""

    def proj(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if not names or names[-1] != "weight" or leaf.ndim != 2:
            return leaf
        is_embedding = len(names) >= 2 and names[-2] == "embedding"
        flag = cfg.use_mp_embedding if is_embedding else cfg.use_weight_normalization
        return normalize(leaf) if flag else leaf

    return jax.tree_util.tree_map_with_path(proj, params)


def build_model_fn(
    cfg: DiTConfig,
    variables: Dict,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
):
    """(model_fn(x, t, y), prepared_variables).

    With ``cfg_scale`` the function is the GLIDE-style batched-CFG forward
    (caller supplies [cond; null] label halves, reference `sample.py:46-48`).
    """
    if fold and cfg.use_weight_normalization:
        cfg = cfg.replace(fold_weights=True)
        variables = dict(
            variables, params=fold_weights_for_inference(variables["params"], cfg)
        )
    model = DiT(cfg)

    if cfg_scale is None:

        def model_fn(x, t, y):
            return model.apply(variables, x, t, y)

    else:

        def model_fn(x, t, y):
            return model.apply(
                variables, x, t, y, cfg_scale, method=DiT.forward_with_cfg
            )

    return model_fn


def build_shared_sample_fn(
    cfg: DiTConfig,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    sampler: str = "ddpm",
    eta: float = 0.0,
    scan_unroll: int = 1,
):
    """Like build_sample_fn but takes variables as a call argument, so one
    compiled program serves many parameter sets (sample_ema.py's five EMA
    stds reuse a single compile)."""
    from mapdit_tpu.diffusion import gd
    from mapdit_tpu.models.dit import DiT

    run_cfg = cfg.replace(fold_weights=True) if (fold and cfg.use_weight_normalization) else cfg
    model = DiT(run_cfg)
    use_fast = (
        sampler == "ddpm"
        and diffusion.mean_type == gd.EPSILON
        and diffusion.var_type == gd.LEARNED_RANGE
    )
    # CFG half-batch chain: the reference (and our legacy path) evolves 2N
    # latents where the second half is re-derived from the first every step
    # and discarded at the end (src/dit.py:107-118). Evolving N latents with
    # the cond/uncond duplication inside the model call does strictly less
    # sampler-side work with identical math (the discarded half never feeds
    # back). The caller still passes the reference-shaped [z; z], [y; null]
    # batch and receives a 2N result ([:n] slice is unchanged).
    half_cfg_chain = cfg_scale is not None

    def prepare(variables: Dict) -> Dict:
        if fold and cfg.use_weight_normalization:
            return dict(
                variables, params=fold_weights_for_inference(variables["params"], run_cfg)
            )
        return variables

    @jax.jit
    def sample_fn(variables: Dict, noise: Array, y: Array, rng: Array) -> Array:
        if cfg_scale is None:
            model_fn = lambda x, t, y: model.apply(variables, x, t, y)
            chain_noise, chain_y = noise, y
        else:
            n_half = noise.shape[0] // 2
            chain_noise = noise[:n_half]
            y_full = y  # [cond labels; null labels], length 2N

            def model_fn(x_half, t, y):
                # duplicate to [cond; uncond] inside the call; t broadcast
                t2 = jnp.concatenate([t, t])
                out = model.apply(
                    variables,
                    jnp.concatenate([x_half, x_half], axis=0),
                    t2,
                    y_full,
                    cfg_scale,
                    method=DiT.forward_with_cfg,
                )
                return out[:n_half]

            chain_y = y[:n_half]

        if sampler == "ddim":
            x = diffusion.ddim_sample_loop(
                model_fn, chain_noise, rng, clip_denoised=False,
                model_kwargs={"y": chain_y}, eta=eta,
            )
        elif sampler == "dpm++":
            from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_loop

            x = dpm_solver_pp_loop(
                diffusion, model_fn, chain_noise, clip_denoised=False,
                model_kwargs={"y": chain_y}, unroll=scan_unroll,
            )
        elif use_fast:
            x = diffusion.p_sample_loop_fast(
                model_fn, chain_noise, rng, clip_denoised=False,
                model_kwargs={"y": chain_y}, unroll=scan_unroll,
            )
        else:
            x = diffusion.p_sample_loop(
                model_fn, chain_noise, rng, clip_denoised=False,
                model_kwargs={"y": chain_y},
            )
        if half_cfg_chain:
            # preserve the reference-shaped 2N output contract
            x = jnp.concatenate([x, x], axis=0)
        return x

    return prepare, sample_fn


def build_sample_fn(
    cfg: DiTConfig,
    variables: Dict,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    sampler: str = "ddpm",
    eta: float = 0.0,
    scan_unroll: int = 1,
):
    """Jitted (noise, y, rng) -> samples over the full denoising chain.

    ``sampler``: "ddpm" (ancestral, the reference scripts' path), "ddim"
    (present-but-unwired in the reference entry points; usable here), or
    "dpm++" (DPM-Solver++(2M), beyond-reference fast ODE sampler — pass
    --num-sampling-steps 10-25).
    Sampling scripts pass clip_denoised=False (reference `sample.py:57`).
    Thin wrapper over :func:`build_shared_sample_fn` with variables closed
    over (prepared once).
    """
    prepare, shared_fn = build_shared_sample_fn(
        cfg, diffusion, cfg_scale=cfg_scale, fold=fold, sampler=sampler, eta=eta,
        scan_unroll=scan_unroll,
    )
    prepared = prepare(variables)

    def sample_fn(noise: Array, y: Array, rng: Array) -> Array:
        return shared_fn(prepared, noise, y, rng)

    return sample_fn
