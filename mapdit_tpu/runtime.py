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


def build_block_stack(params, cfg: DiTConfig):
    """Depth-stack the per-block effective weights + gains for the
    whole-stack Pallas megakernel (``block_kernel="mega_stack"``).

    Runs once at prepare() time — OUTSIDE the jitted sampling scan — so the
    (depth, ...) stacks are plain device buffers the kernel block-streams;
    no per-step restacking ever happens. Requires folded weights
    (fold_weights=True): stored weight == effective weight."""
    assert cfg.fold_weights, "mega_stack needs folded (pre-normalized) weights"

    def stack(*path):
        leaves = []
        for i in range(cfg.depth):
            leaf = params[f"blocks_{i}"]
            for p in path:
                leaf = leaf[p]
            leaves.append(leaf)
        return jnp.stack(leaves).astype(cfg.dtype)

    gains = jnp.stack(
        [
            jnp.stack(
                [
                    params[f"blocks_{i}"]["gain_msa"],
                    params[f"blocks_{i}"]["gain_mlp"],
                ]
            )
            for i in range(cfg.depth)
        ]
    ).astype(jnp.float32)
    return {
        "gains": gains,
        "w_mod": stack("modulation", "linear", "weight"),
        "w_qkv": stack("attn", "qkv_proj", "weight"),
        "w_out": stack("attn", "out_proj", "weight"),
        "w1": stack("mlp", "fc1", "weight"),
        "w2": stack("mlp", "fc2", "weight"),
    }


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


def cfg_interval_segments(diffusion, sigma_lo: float, sigma_hi: float):
    """Map a [sigma_lo, sigma_hi] noise-level interval to the contiguous
    chain-position range [g0, g1) of guided steps.

    sigma(t) = sqrt((1-acp_t)/acp_t) on the (respaced) grid, walked in chain
    order (high t first), so sigma is monotonically decreasing and the
    guided set is always one contiguous run. An interval covering no grid
    point yields the empty range (0, 0): a fully unguided chain."""
    import numpy as np

    acp = np.asarray(diffusion.alphas_cumprod, dtype=np.float64)
    sigma = np.sqrt((1.0 - acp) / acp)[::-1]  # chain order: high t -> low t
    guided = (sigma >= float(sigma_lo)) & (sigma <= float(sigma_hi))
    idx = np.flatnonzero(guided)
    if idx.size == 0:
        return (0, 0)
    g0, g1 = int(idx[0]), int(idx[-1]) + 1
    assert guided[g0:g1].all()  # contiguity (monotone sigma)
    return (g0, g1)


def build_shared_sample_fn(
    cfg: DiTConfig,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    sampler: str = "ddpm",
    eta: float = 0.0,
    scan_unroll: int = 1,
    clip_denoised: bool = False,
    cfg_interval: Optional[tuple] = None,
    batch_hint: Optional[int] = None,
    dynamic_threshold: Optional[float] = None,
):
    """Like build_sample_fn but takes variables as a call argument, so one
    compiled program serves many parameter sets (sample_ema.py's five EMA
    stds reuse a single compile).

    ``dynamic_threshold``: percentile for Imagen-style per-sample x0
    thresholding (:func:`mapdit_tpu.diffusion.gaussian.dynamic_threshold_fn`);
    None disables it.

    ``batch_hint`` (pre-CFG sample count the caller will pass): lets the
    ``auto`` kernel policy promote the whole-STACK megakernel where it is
    measured faster than per-block ``mega`` (batch >= 8 at S-class; see
    blocks._stack_auto_ok). Purely an optimization hint — any batch still
    runs correctly without it.

    ``cfg_interval=(sigma_lo, sigma_hi)``: limited-interval guidance
    (Kynkaanniemi et al., arXiv 2404.07724) — CFG is applied only on chain
    steps whose noise level sigma(t) = sqrt((1-acp_t)/acp_t) lies inside
    the interval; outside it the chain runs the COND-ONLY model on N rows
    instead of the 2N [cond; uncond] CFG batch. The guidance pattern is
    static (the respaced sigma grid is known at trace time), so the chain
    compiles as up to three fixed-shape scan segments stitched through the
    carried (x, rng/history) state — no runtime branching, and the full
    interval reproduces the exact CFG chain bit-for-bit (carried RNG
    stream). The paper reports this IMPROVES FID at high guidance scales;
    FLOPs drop by ~(unguided_steps)/(2*steps). ddpm + dpm++ only.
    """
    from mapdit_tpu.diffusion import gd
    from mapdit_tpu.models.dit import DiT

    run_cfg = cfg.replace(fold_weights=True) if (fold and cfg.use_weight_normalization) else cfg
    if run_cfg.block_kernel == "auto":
        from mapdit_tpu.models.blocks import _stack_auto_ok

        if _stack_auto_ok(run_cfg, batch_hint):
            run_cfg = run_cfg.replace(block_kernel="mega_stack")
    model = DiT(run_cfg)
    use_stack = run_cfg.block_kernel == "mega_stack"
    if use_stack:
        from mapdit_tpu.models.blocks import _kernel_family_ok

        assert _kernel_family_ok(run_cfg), (
            "mega_stack hard-codes the MP + adaln + cosine-attention family"
        )
        assert run_cfg.fold_weights, "mega_stack needs fold=True (folded weights)"
        assert not run_cfg.scan_blocks, "mega_stack replaces scan_blocks"
    use_fast = (
        sampler == "ddpm"
        and diffusion.mean_type == gd.EPSILON
        and diffusion.var_type == gd.LEARNED_RANGE
    )
    if cfg_interval is not None:
        assert cfg_scale is not None, "--cfg-interval needs CFG (cfg_scale)"
        assert sampler in ("dpm++", "unipc") or use_fast, (
            "--cfg-interval composes with --sampler ddpm, dpm++ or unipc"
        )
        cfg_segments = cfg_interval_segments(diffusion, *cfg_interval)
    else:
        cfg_segments = None
    if dynamic_threshold is not None:
        from mapdit_tpu.diffusion.gaussian import dynamic_threshold_fn

        denoised = dynamic_threshold_fn(dynamic_threshold)
    else:
        denoised = None
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
            variables = dict(
                variables, params=fold_weights_for_inference(variables["params"], run_cfg)
            )
        if use_stack:
            variables = dict(
                variables,
                block_stack=build_block_stack(variables["params"], run_cfg),
            )
        return variables

    @jax.jit
    def sample_fn(variables: Dict, noise: Array, y: Array, rng: Array) -> Array:
        variables = dict(variables)
        stack = variables.pop("block_stack", None)
        if cfg_scale is None:
            model_fn = lambda x, t, y: model.apply(
                variables, x, t, y, block_stack=stack
            )
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
                    block_stack=stack,
                    method=DiT.forward_with_cfg,
                )
                return out[:n_half]

            chain_y = y[:n_half]

        if cfg_segments is not None:
            # limited-interval guidance: unguided chain positions run the
            # plain cond-only forward on N rows (no [cond; uncond] doubling)
            def model_fn_cond(x_half, t, y):
                return model.apply(variables, x_half, t, y, block_stack=stack)

            g0, g1 = cfg_segments
            T = diffusion.num_timesteps
            kw = dict(
                clip_denoised=clip_denoised,
                denoised_fn=denoised,
                model_kwargs={"y": chain_y},
                unroll=scan_unroll,
            )
            if sampler == "dpm++":
                from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_loop

                x, x0 = dpm_solver_pp_loop(
                    diffusion, model_fn_cond, chain_noise,
                    step_slice=(0, g0), return_carry=True, **kw,
                )
                x, x0 = dpm_solver_pp_loop(
                    diffusion, model_fn, x, prev_x0=x0,
                    step_slice=(g0, g1), return_carry=True, **kw,
                )
                x = dpm_solver_pp_loop(
                    diffusion, model_fn_cond, x, prev_x0=x0,
                    step_slice=(g1, T), **kw,
                )
            elif sampler == "unipc":
                from mapdit_tpu.diffusion.unipc import unipc_loop

                carry = unipc_loop(
                    diffusion, model_fn_cond, chain_noise,
                    step_slice=(0, g0), return_carry=True, **kw,
                )
                carry = unipc_loop(
                    diffusion, model_fn, carry[0], prev_carry=carry,
                    step_slice=(g0, g1), return_carry=True, **kw,
                )
                x = unipc_loop(
                    diffusion, model_fn_cond, carry[0], prev_carry=carry,
                    step_slice=(g1, T), **kw,
                )
            else:  # use_fast ddpm (asserted at build time)
                x, key = diffusion.p_sample_loop_fast(
                    model_fn_cond, chain_noise, rng,
                    step_slice=(0, g0), return_carry=True, **kw,
                )
                x, key = diffusion.p_sample_loop_fast(
                    model_fn, x, key,
                    step_slice=(g0, g1), return_carry=True, **kw,
                )
                x = diffusion.p_sample_loop_fast(
                    model_fn_cond, x, key, step_slice=(g1, T), **kw,
                )
            return jnp.concatenate([x, x], axis=0)

        if sampler == "ddim":
            x = diffusion.ddim_sample_loop(
                model_fn, chain_noise, rng, clip_denoised=clip_denoised,
                denoised_fn=denoised, model_kwargs={"y": chain_y}, eta=eta,
            )
        elif sampler == "dpm++":
            from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_loop

            x = dpm_solver_pp_loop(
                diffusion, model_fn, chain_noise, clip_denoised=clip_denoised,
                denoised_fn=denoised, model_kwargs={"y": chain_y},
                unroll=scan_unroll,
            )
        elif sampler == "unipc":
            from mapdit_tpu.diffusion.unipc import unipc_loop

            x = unipc_loop(
                diffusion, model_fn, chain_noise, clip_denoised=clip_denoised,
                denoised_fn=denoised, model_kwargs={"y": chain_y},
                unroll=scan_unroll,
            )
        elif use_fast:
            x = diffusion.p_sample_loop_fast(
                model_fn, chain_noise, rng, clip_denoised=clip_denoised,
                denoised_fn=denoised, model_kwargs={"y": chain_y},
                unroll=scan_unroll,
            )
        else:
            x = diffusion.p_sample_loop(
                model_fn, chain_noise, rng, clip_denoised=clip_denoised,
                denoised_fn=denoised, model_kwargs={"y": chain_y},
            )
        if half_cfg_chain:
            # preserve the reference-shaped 2N output contract
            x = jnp.concatenate([x, x], axis=0)
        return x

    return prepare, sample_fn


def build_cached_sample_fn(
    cfg: DiTConfig,
    variables: Dict,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    span: Optional[tuple] = None,
    cache_interval: int = 2,
    clip_denoised: bool = False,
    sampler: str = "ddpm",
    cfg_interval: Optional[tuple] = None,
    cache_mode: str = "forecast",
    dynamic_threshold: Optional[float] = None,
):
    """Denoising chain with Delta-DiT-style block-span caching (arXiv
    2406.01125), for the ancestral DDPM chain or the DPM-Solver++(2M) ODE
    chain (``sampler="dpm++"`` — composes with karras-respaced schedules,
    since the respacing lives in ``diffusion``).

    The chain scans over groups of ``cache_interval`` steps: the group's
    first step runs the full model and records the displacement of the
    block span ``[span[0], span[1])``; the remaining steps replace that
    span with the cached displacement (the Delta-DiT approximation — a
    span's contribution drifts slowly across adjacent timesteps), skipping
    its compute entirely. The protocol wraps the *model call*, not the
    chain math, which is why it is sampler-agnostic. Per-step FLOPs drop by
    ``(hi-lo)/depth * (interval-1)/interval``. This is a LOSSY accelerator:
    pair any use with a measured deviation against the exact chain
    (tests/test_runtime_cache.py does; docs/BENCH_NOTES.md records it).

    ``span`` defaults to the middle half of the depth. Exactness limits
    (tested): an empty span or ``cache_interval=1`` reproduces the exact
    chain bit-for-bit (same RNG stream as ``p_sample_loop_fast`` /
    same op order as ``dpm_solver_pp_loop``).

    ``cache_mode="forecast"``: instead of HOLDING the span displacement
    constant across a group's skip steps (Delta-DiT), linearly EXTRAPOLATE
    it from the two most recent full evaluations — the static, jit-friendly
    form of linear multistep feature forecasting (Predict-to-Skip, arXiv
    2602.18093; their dynamic skip scheduling is trace-hostile, the
    first-order forecast is not). Skip step s of group i uses
    ``delta_i + (s/interval) * (delta_i - delta_{i-1})``; the previous
    group's delta rides the scan carry, and the first group of each scan
    segment falls back to hold (no history). Identical FLOPs and memory
    traffic to "hold" (one extra VPU axpy per skip step); measured
    deviation vs the exact chain is recorded in docs/BENCH_NOTES.md.

    ``cfg_interval=(sigma_lo, sigma_hi)``: limited-interval guidance (see
    :func:`build_shared_sample_fn`) composed with the cached chain. The
    guided range is snapped OUTWARD to cache-group boundaries (a group's
    steps share one cached delta, whose shape differs between the 2N CFG
    call and the N cond-only call, so a group must be wholly one or the
    other; outward keeps at least the requested guidance). The chain then
    runs as three group-scans stitched through the carried state — the
    full-sigma interval reproduces the plain cached CFG chain and the
    empty interval the cond-only cached chain (both tested).
    """
    import numpy as np

    from mapdit_tpu.diffusion import gd
    from mapdit_tpu.models.dit import DiT

    assert sampler in ("ddpm", "dpm++"), sampler
    assert cache_mode in ("hold", "forecast"), cache_mode
    assert cfg.block_kernel != "mega_stack", (
        "block-span caching skips a block subrange, which the whole-stack "
        "kernel cannot express — use --block-kernel mega (or auto) with "
        "--cache-interval"
    )
    assert diffusion.mean_type == gd.EPSILON and diffusion.var_type == gd.LEARNED_RANGE
    n_steps = diffusion.num_timesteps
    assert n_steps % cache_interval == 0, (n_steps, cache_interval)
    forecast = cache_mode == "forecast" and cache_interval > 1
    if cfg_interval is not None:
        assert cfg_scale is not None, "cfg_interval needs CFG (cfg_scale)"
        g0, g1 = cfg_interval_segments(diffusion, *cfg_interval)
        # snap outward to whole cache groups (see docstring)
        group_lo, group_hi = g0 // cache_interval, -(-g1 // cache_interval)
    else:
        group_lo = group_hi = None
    if span is None:
        span = (cfg.depth // 4, cfg.depth - cfg.depth // 4)
    if dynamic_threshold is not None:
        from mapdit_tpu.diffusion.gaussian import dynamic_threshold_fn

        denoised = dynamic_threshold_fn(dynamic_threshold)
    else:
        denoised = None

    run_cfg = cfg.replace(fold_weights=True) if (fold and cfg.use_weight_normalization) else cfg
    assert not run_cfg.scan_blocks, "block-span caching needs scan_blocks=False"
    model = DiT(run_cfg)
    if fold and cfg.use_weight_normalization:
        variables = dict(
            variables, params=fold_weights_for_inference(variables["params"], run_cfg)
        )

    ts = jnp.arange(n_steps - 1, -1, -1)
    if sampler == "ddpm":
        coefs = (
            diffusion.timestep_map[ts].astype(jnp.float32),
            diffusion.sqrt_recip_alphas_cumprod[ts],
            diffusion.sqrt_recipm1_alphas_cumprod[ts],
            diffusion.posterior_mean_coef1[ts],
            diffusion.posterior_mean_coef2[ts],
            diffusion.posterior_log_variance_clipped[ts],
            diffusion.log_betas[ts],
            (ts != 0).astype(jnp.float32),
        )
    else:
        from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_coefficients

        sigma_ratio, alpha_next, em1, c2 = dpm_solver_pp_coefficients(
            np.asarray(diffusion.alphas_cumprod)
        )
        coefs = (
            diffusion.timestep_map[ts].astype(jnp.float32),
            diffusion.sqrt_recip_alphas_cumprod[ts],
            diffusion.sqrt_recipm1_alphas_cumprod[ts],
            jnp.asarray(sigma_ratio),
            jnp.asarray(alpha_next),
            jnp.asarray(em1),
            jnp.asarray(c2),
        )
    n_groups = n_steps // cache_interval
    gcoefs = tuple(a.reshape(n_groups, cache_interval) for a in coefs)

    @jax.jit
    def sample_fn(noise: Array, y: Array, rng: Array) -> Array:
        if cfg_scale is None:
            chain_noise, chain_y = noise, y

            def call(x, t_vec, delta):
                if delta is None:
                    return model.apply(
                        variables, x, t_vec, chain_y, span=span, return_delta=True
                    )
                return (
                    model.apply(
                        variables, x, t_vec, chain_y, span=span, cached_delta=delta
                    ),
                    delta,
                )

        else:
            n_half = noise.shape[0] // 2
            chain_noise = noise[:n_half]
            y_full = y  # [cond; null]

            def call(x_half, t_vec, delta):
                out = model.apply(
                    variables,
                    jnp.concatenate([x_half, x_half], axis=0),
                    jnp.concatenate([t_vec, t_vec]),
                    y_full,
                    cfg_scale,
                    span=span,
                    cached_delta=delta,
                    return_delta=delta is None,
                    method=DiT.forward_with_cfg,
                )
                if delta is None:
                    out, delta = out
                return out[:n_half], delta

            def call_cond(x_half, t_vec, delta):
                # unguided cfg_interval segments: cond-only on N rows (the
                # cached delta is N-shaped here — group-aligned segmentation
                # guarantees a delta never crosses between call variants)
                out = model.apply(
                    variables,
                    x_half,
                    t_vec,
                    y_full[:n_half],
                    span=span,
                    cached_delta=delta,
                    return_delta=delta is None,
                )
                if delta is None:
                    out, delta = out
                return out, delta

        n = chain_noise.shape[0]

        def step_call(call, x, model_t, s, delta, prev_delta, has_prev):
            """Group step s: full model at s=0 (records the span delta);
            skip steps reuse the held or linearly-forecast delta."""
            if s == 0:
                return call(x, jnp.full((n,), model_t), None)
            pred = delta
            if forecast:
                coef = (has_prev * (s / cache_interval)).astype(delta.dtype)
                pred = delta + coef * (delta - prev_delta)
            out, _ = call(x, jnp.full((n,), model_t), pred)
            return out, delta

        if sampler == "ddpm":

            def make_group_body(call):
                def group_body(carry, xs):
                    gc, has_prev = xs
                    (x, key), prev_delta = carry[:2], (carry[2] if forecast else None)
                    delta = None
                    for s in range(cache_interval):
                        model_t, sra, srm1, pc1, pc2, min_log, max_log, nonzero = (
                            a[s] for a in gc
                        )
                        key, step_key = jax.random.split(key)
                        out, delta = step_call(
                            call, x, model_t, s, delta, prev_delta, has_prev
                        )
                        eps_hat, var_values = jnp.split(out, 2, axis=1)
                        frac = (var_values + 1.0) / 2.0
                        log_variance = frac * max_log + (1.0 - frac) * min_log
                        pred_xstart = sra * x - srm1 * eps_hat
                        if denoised is not None:
                            pred_xstart = denoised(pred_xstart)
                        if clip_denoised:
                            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
                        mean = pc1 * pred_xstart + pc2 * x
                        step_noise = jax.random.normal(step_key, x.shape, x.dtype)
                        x = mean + nonzero * jnp.exp(0.5 * log_variance) * step_noise
                    return ((x, key, delta) if forecast else (x, key)), None

                return group_body

            init = (chain_noise, rng)
        else:
            # DPM-Solver++(2M) group step (diffusion/dpm_solver.py math with
            # the cached-span model call); deterministic — rng unused
            def make_group_body(call):
                def group_body(carry, xs):
                    gc, has_prev = xs
                    (x, prev_x0), prev_delta = carry[:2], (carry[2] if forecast else None)
                    delta = None
                    for s in range(cache_interval):
                        model_t, sra, srm1, s_ratio, a_next, e, w2 = (
                            a[s] for a in gc
                        )
                        out, delta = step_call(
                            call, x, model_t, s, delta, prev_delta, has_prev
                        )
                        eps_hat, _ = jnp.split(out, 2, axis=1)
                        x0 = sra * x - srm1 * eps_hat
                        if denoised is not None:
                            x0 = denoised(x0)
                        if clip_denoised:
                            x0 = jnp.clip(x0, -1.0, 1.0)
                        d = (1.0 + w2) * x0 - w2 * prev_x0
                        x = s_ratio * x - a_next * e * d
                        prev_x0 = x0
                    return ((x, prev_x0, delta) if forecast else (x, prev_x0)), None

                return group_body

            init = (chain_noise, jnp.zeros_like(chain_noise))

        def run_scan(body, base_carry, a, b, rows):
            """One group-scan over groups [a, b); the forecast history is
            scan-local (first group of each segment has no predecessor, so
            it holds — has_prev=0 masks the zeros init)."""
            gcs = tuple(g[a:b] for g in gcoefs)
            hp = jnp.asarray((np.arange(a, b) != a).astype(np.float32))
            carry = base_carry
            if forecast:
                carry = base_carry + (
                    jnp.zeros((rows, cfg.num_patches, cfg.hidden_size), run_cfg.dtype),
                )
            carry, _ = jax.lax.scan(body, carry, (gcs, hp))
            return carry[:2]

        cfg_rows = n if cfg_scale is None else 2 * n
        if group_lo is None:
            x, _ = run_scan(make_group_body(call), init, 0, n_groups, cfg_rows)
        else:
            # limited-interval guidance over whole cache groups: three
            # group-scans stitched through the carried (x, aux) state
            body, body_cond = make_group_body(call), make_group_body(call_cond)
            carry = run_scan(body_cond, init, 0, group_lo, n)
            carry = run_scan(body, carry, group_lo, group_hi, 2 * n)
            x, _ = run_scan(body_cond, carry, group_hi, n_groups, n)
        if cfg_scale is not None:
            x = jnp.concatenate([x, x], axis=0)
        return x

    return sample_fn


def build_sample_fn(
    cfg: DiTConfig,
    variables: Dict,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    sampler: str = "ddpm",
    eta: float = 0.0,
    scan_unroll: int = 1,
    clip_denoised: bool = False,
    cfg_interval: Optional[tuple] = None,
    batch_hint: Optional[int] = None,
    dynamic_threshold: Optional[float] = None,
    mesh=None,
):
    """Jitted (noise, y, rng) -> samples over the full denoising chain.

    ``sampler``: "ddpm" (ancestral, the reference scripts' path), "ddim"
    (present-but-unwired in the reference entry points; usable here), or
    "dpm++" (DPM-Solver++(2M), beyond-reference fast ODE sampler — pass
    --num-sampling-steps 10-25), or "unipc" (UniPC bh2 order 2 +
    corrector, arXiv 2302.04867 — effective order 3 at the same
    model-call count as dpm++).
    ``cfg_interval``: see :func:`build_shared_sample_fn`.
    Sampling scripts pass clip_denoised=False (reference `sample.py:57`).
    Thin wrapper over :func:`build_shared_sample_fn` with variables closed
    over (prepared once).

    ``mesh``: optional ``('data', 'model')`` :class:`jax.sharding.Mesh` —
    the prepared parameter tree is device_put with the training TP layout
    (:func:`mapdit_tpu.parallel.mesh.param_sharding`: QKV / MLP-in split on
    the head/out dim, out-proj / MLP-out on the in dim, everything else
    replicated) so a nontrivial 'model' axis tensor-parallelizes every
    model call inside the chain — GSPMD inserts the branch-output psums
    over ICI, exactly as in training. This is the latency layout: it
    shrinks the per-call wall-clock for batch sizes too small to fill a
    data axis (a data-parallel mesh leaves tp=1 and only splits the batch).
    Callers run the returned fn under ``jax.set_mesh(mesh)`` with the batch
    sharded over 'data'. The Pallas megakernels have no GSPMD partitioning
    rule, but a nontrivial 'model' axis promotes ``auto`` to the
    head-sharded shard_map island (``mega_attn_tp``,
    :func:`mapdit_tpu.models.blocks.resolve_block_kernel_tp`) so the TP
    latency layout keeps the attention kernel live; other explicit kernels
    are rejected here.
    """
    run_cfg = cfg
    if mesh is not None and mesh.devices.size > 1:
        from mapdit_tpu.models.blocks import resolve_block_kernel_tp
        from mapdit_tpu.parallel.mesh import MODEL_AXIS

        assert cfg.block_kernel in ("auto", "off", "mega_attn_tp", "mega_tp"), (
            "explicit Pallas block kernels cannot be GSPMD-partitioned; "
            "use block_kernel='auto' (promotes to the full-block mega_tp "
            "island when the 'model' axis supports it, XLA "
            "pipeline otherwise) or the shard_map data-parallel path"
        )
        tp = dict(mesh.shape).get(MODEL_AXIS, 1)
        if cfg.block_kernel in ("mega_attn_tp", "mega_tp"):
            assert tp > 1 and cfg.num_heads % tp == 0, (cfg.num_heads, tp)
            if cfg.block_kernel == "mega_tp":
                assert int(cfg.hidden_size * cfg.mlp_ratio) % tp == 0, (
                    cfg.hidden_size, cfg.mlp_ratio, tp,
                )
        elif cfg.block_kernel == "auto":
            run_cfg = cfg.replace(
                block_kernel=resolve_block_kernel_tp(
                    cfg, folded=fold and cfg.use_weight_normalization, tp=tp
                )
            )
    prepare, shared_fn = build_shared_sample_fn(
        run_cfg, diffusion, cfg_scale=cfg_scale, fold=fold, sampler=sampler,
        eta=eta, scan_unroll=scan_unroll, clip_denoised=clip_denoised,
        cfg_interval=cfg_interval, batch_hint=batch_hint,
        dynamic_threshold=dynamic_threshold,
    )
    prepared = prepare(variables)
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mapdit_tpu.parallel.mesh import param_sharding, shard_tree

        shardings = param_sharding(prepared, mesh)
        if run_cfg.block_kernel in ("mega_attn_tp", "mega_tp"):
            # The island slices qkv per-head from a (3, D, D) view; the flat
            # (3D, D) model split would misalign with the q/k/v blocks and
            # force a cross-device reshard at the shard_map boundary every
            # call. Replicate qkv (a few MB) so the boundary is a free local
            # slice; out_proj's in-cols split already matches the island —
            # as do fc1's out-rows and fc2's in-cols splits for mega_tp,
            # and the (replicated) modulation-head weight.
            def _fix(path, s):
                names = [p.key for p in path if hasattr(p, "key")]
                if "qkv_proj" in names:
                    return NamedSharding(mesh, P())
                return s

            shardings = jax.tree_util.tree_map_with_path(_fix, shardings)
        prepared = shard_tree(prepared, shardings)

    def sample_fn(noise: Array, y: Array, rng: Array) -> Array:
        return shared_fn(prepared, noise, y, rng)

    return sample_fn


def build_dp_sharded_sample_fn(
    cfg: DiTConfig,
    variables: Dict,
    diffusion,
    mesh,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    sampler: str = "ddpm",
    eta: float = 0.0,
    scan_unroll: int = 1,
    clip_denoised: bool = False,
    cfg_interval: Optional[tuple] = None,
    batch_hint: Optional[int] = None,
    dynamic_threshold: Optional[float] = None,
):
    """Data-parallel sampling with per-shard Pallas kernels (shard_map).

    GSPMD has no partitioning rule for the megakernel custom-calls, so the
    ``auto`` gate disables them whenever ``device_count > 1`` — sharded FID
    sampling (`sample_fid.py`) falls back to the XLA pipeline and loses the
    kernel speedups (625 vs 409 steps/s/chip at S/2, BENCH_NOTES r03). This
    wrapper instead runs the ENTIRE single-chip chain inside
    ``jax.shard_map`` over the mesh's data axis: each shard executes the
    exact single-device program (kernels legal, resolved by
    :func:`~mapdit_tpu.models.blocks.resolve_block_kernel_shard_local`),
    params replicated, batch split. Collective-free — shards never
    communicate during the chain, the idiomatic layout for batch sampling
    (scaling-book DP recipe: replicate params, split batch, zero ICI).

    Interface difference vs :func:`build_sample_fn`: takes the UN-doubled
    ``(N, C, H, W)`` noise and ``(N,)`` cond labels — the CFG doubling
    happens per shard so cond/uncond pairs never straddle a shard boundary.

    RNG: the chain key is ``fold_in(key, axis_index)`` per shard — shards
    draw independent noise streams. For a fixed mesh size this is
    bitwise-reproducible, but it is a DIFFERENT (equally valid) stream than
    the single-device / GSPMD chain produces for the same key.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mapdit_tpu.models.blocks import resolve_block_kernel_shard_local
    from mapdit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    assert mesh.shape[MODEL_AXIS] == 1, (
        "kernel-sharded sampling is data-parallel only (the kernels are "
        "whole-layer programs; use the GSPMD path for tensor parallelism)"
    )
    folded = fold and cfg.use_weight_normalization
    n_shards_hint = mesh.shape[DATA_AXIS]
    resolved = resolve_block_kernel_shard_local(cfg, folded)
    if resolved == "mega" and batch_hint is not None:
        # per-shard batch is known at build time — apply the same stack
        # promotion as the single-chip runtime (each shard IS one device,
        # so the device-count probe is skipped; see blocks._stack_auto_ok)
        from mapdit_tpu.models.blocks import _stack_auto_ok

        shard_batch = max(1, batch_hint // n_shards_hint)
        if _stack_auto_ok(
            cfg.replace(fold_weights=folded), shard_batch,
            single_device_ok=True,
        ):
            resolved = "mega_stack"
    run_cfg = cfg.replace(block_kernel=resolved)
    prepare, shared_fn = build_shared_sample_fn(
        run_cfg, diffusion, cfg_scale=cfg_scale, fold=fold, sampler=sampler,
        eta=eta, scan_unroll=scan_unroll, clip_denoised=clip_denoised,
        cfg_interval=cfg_interval, dynamic_threshold=dynamic_threshold,
    )
    prepared = jax.device_put(
        prepare(variables), NamedSharding(mesh, P())
    )
    num_classes = cfg.num_classes
    n_shards = mesh.shape[DATA_AXIS]

    def local_chain(prepared, z, y, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        n = z.shape[0]
        if cfg_scale is not None:
            z = jnp.concatenate([z, z], axis=0)
            y = jnp.concatenate(
                [y, jnp.full((n,), num_classes, y.dtype)], axis=0
            )
        return shared_fn(prepared, z, y, rng)[:n]

    sharded = jax.jit(
        jax.shard_map(
            local_chain,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )

    def sample_fn(noise: Array, y: Array, rng: Array) -> Array:
        assert noise.shape[0] % n_shards == 0, (noise.shape, n_shards)
        return sharded(prepared, noise, y, rng)

    return sample_fn


def build_pit_sample_fn(
    cfg: DiTConfig,
    variables: Dict,
    diffusion,
    cfg_scale: Optional[float] = None,
    fold: bool = True,
    window: int = 8,
    sweeps: int = 2,
    shift: Optional[int] = None,
    clip_denoised: bool = False,
    dynamic_threshold: Optional[float] = None,
    mesh=None,
):
    """Parallel-in-time DDIM sampling (block/sliding Picard,
    ParaDiGMS-family — Shih et al., arXiv 2305.16317, restructured for XLA).

    The sequential DDIM chain x_{i+1} = Phi(x_i, t_i) is solved in blocks
    of ``window`` consecutive steps: each Picard sweep evaluates the model
    at ALL window positions in ONE batched call (window*B rows — per-row
    timesteps, so one program) and shifts the resulting states one
    position down the window; ``sweeps`` Jacobi sweeps run per block.
    After sweep j the first j positions are exact, so

      * ``sweeps == window``  reproduces the sequential chain EXACTLY
        (tested bit-tight) — pure latency-for-FLOPs restructuring;
      * ``sweeps < window``   is the accelerated regime: J/K of the
        sequential chain's sequential-dependency depth at J x the FLOPs.

    This is a MULTI-CHIP LATENCY technique: the window rows ride the
    mesh's 'data' axis (sharding constraint inside the sweep), so on a
    >=window-chip slice each sweep costs one per-chip model call and the
    chain's wall-clock drops ~window/sweeps for a single sample — the
    axis neither DP (throughput) nor TP (per-call latency) covers.
    Single-chip it is strictly slower (measured refutation of the
    batch-sweep arithmetic, docs/ROADMAP.md "Parallel-in-time") — it
    exists for pod-scale serving, correctness-proven on the virtual mesh.

    Unlike ParaDiGMS's adaptive window sliding (data-dependent
    convergence tests are trace-hostile), both schedules here are static
    and compile to one scan program; the deviation knob is the schedule,
    arbitrated like every lossy accelerator (probe rows).

    ``shift=S`` selects the SLIDING schedule instead (closer to the
    paper's): after ``window//S - 1`` parked warm-up sweeps, every sweep
    accepts the window's leading S positions and slides — each position
    is refined ``window/S`` times by sweeps that straddle it at S
    different window depths, so its final refinement happens right next
    to the already-accepted entry state. Measured on trained weights at
    matched cost (depth /2, FLOPs x5) the staggering roughly halves the
    trajectory deviation and keeps the learned conditioning the block
    schedule loses (label_acc 0.844 vs 0.563, exact 0.875 — BENCH_NOTES
    r03s9 table). Depth = (window/S - 1) + T/S sweeps (vs T sequential
    steps); FLOPs = (window/S) x sequential; ``shift=1`` reproduces the
    sequential chain exactly (each accepted position is one sweep
    downstream of an exact entry — tested). ``sweeps`` is ignored when
    ``shift`` is given.

    DDIM eta=0 only (the deterministic map Picard iterates on; ancestral
    chains would need a frozen per-position noise table). CFG composes
    (the [cond; uncond] doubling happens inside the per-row call); the
    reference-shaped [z; z] / [y; null] batch contract matches
    build_sample_fn. ``mesh`` composes with TP exactly as in
    build_sample_fn (params via param_sharding; rows over 'data').
    """
    import numpy as np

    T = diffusion.num_timesteps
    if shift is not None:
        assert window % shift == 0 and T % shift == 0, (
            f"shift {shift} must divide window {window} and chain length {T}"
        )
        assert window <= T, (window, T)
    else:
        assert T % window == 0, (
            f"window {window} must divide the respaced chain length {T}"
        )
        assert 1 <= sweeps <= window, (sweeps, window)
    run_cfg = cfg.replace(fold_weights=True) if (fold and cfg.use_weight_normalization) else cfg
    model = DiT(run_cfg)
    if dynamic_threshold is not None:
        from mapdit_tpu.diffusion.gaussian import dynamic_threshold_fn

        denoised = dynamic_threshold_fn(dynamic_threshold)
    else:
        denoised = None

    prepared = variables
    if fold and cfg.use_weight_normalization:
        prepared = dict(
            variables, params=fold_weights_for_inference(variables["params"], run_cfg)
        )
    if mesh is not None and mesh.devices.size > 1:
        # same invariant as build_sample_fn: GSPMD has no partitioning rule
        # for the Pallas kernel custom-calls (auto already resolves to the
        # XLA pipeline on multi-device meshes)
        assert cfg.block_kernel in ("auto", "off"), (
            "explicit Pallas block kernels cannot be GSPMD-partitioned; "
            "use block_kernel='auto' for parallel-in-time sampling on a mesh"
        )
        from mapdit_tpu.parallel.mesh import param_sharding, shard_tree

        prepared = shard_tree(prepared, param_sharding(prepared, mesh))

    def _row_shard(x):
        # flattened (window*B, C, H, W) rows ride the data axis — at B=1 on
        # a window-chip slice each device owns exactly one window position
        if mesh is None or mesh.devices.size == 1:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mapdit_tpu.parallel.mesh import DATA_AXIS

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(DATA_AXIS))
        )

    @jax.jit
    def sample_fn(noise: Array, y: Array, rng: Array) -> Array:
        del rng  # eta=0: the chain consumes no noise
        if cfg_scale is None:
            n = noise.shape[0]
            x0_rows, y_rows = noise, y
            y_tiled = jnp.tile(y_rows, window)

            def model_fn(x, t, y):
                return model.apply(prepared, x, t, y)

        else:
            n = noise.shape[0] // 2
            x0_rows = noise[:n]
            y_cond = y[:n]
            y_tiled = jnp.tile(y_cond, window)
            y_full = jnp.concatenate(
                [y_tiled, jnp.full((window * n,), run_cfg.num_classes, jnp.int32)]
            )

            def model_fn(x_half, t, y):
                t2 = jnp.concatenate([t, t])
                out = model.apply(
                    prepared,
                    jnp.concatenate([x_half, x_half], axis=0),
                    t2,
                    y_full,
                    cfg_scale,
                    method=DiT.forward_with_cfg,
                )
                return out[: window * n]

        dummy_key = jax.random.PRNGKey(0)  # sigma=0 multiplies the draw away

        def ddim_rows(x_rows, t_rows):
            out = diffusion.ddim_sample(
                model_fn, x_rows, t_rows, dummy_key,
                clip_denoised=clip_denoised, denoised_fn=denoised,
                model_kwargs={"y": y_tiled}, eta=0.0,
            )
            return out["sample"]

        def sweep_rows(X, t_rows):
            flat = _row_shard(X.reshape(window * n, *X.shape[2:]))
            nxt = ddim_rows(flat, t_rows)
            return nxt.reshape(window, n, *X.shape[2:])

        if shift is not None:
            # sliding schedule: warm up parked, then accept S per sweep
            chain = np.arange(T - 1, -1, -1)  # chain-order timesteps
            slides = T // shift
            # iteration i window covers chain positions [i*S, i*S + K)
            pos = (np.arange(slides)[:, None] * shift
                   + np.arange(window)[None, :])
            t_mat = jnp.asarray(chain[np.minimum(pos, T - 1)])
            warm = window // shift - 1

            X0 = jnp.broadcast_to(x0_rows[None], (window, *x0_rows.shape))
            t_rows0 = jnp.repeat(t_mat[0], n)

            def parked(_, X):
                Y = sweep_rows(X, t_rows0)
                return jnp.concatenate([x0_rows[None], Y[:-1]], axis=0)

            X = jax.lax.fori_loop(0, warm, parked, X0)

            def slide(carry, t_slots):
                x_entry, X = carry
                Y = sweep_rows(X, jnp.repeat(t_slots, n))
                new_entry = Y[shift - 1]
                fresh = jnp.broadcast_to(Y[-1][None], (shift, *Y.shape[1:]))
                Xn = jnp.concatenate([Y[shift - 1 : window - 1], fresh], axis=0)
                return (new_entry, Xn), None

            (x, _), _ = jax.lax.scan(slide, (x0_rows, X), t_mat)
            if cfg_scale is not None:
                x = jnp.concatenate([x, x], axis=0)
            return x

        ts = jnp.arange(T - 1, -1, -1).reshape(T // window, window)

        def block(x_entry, t_block):
            # X[k] is the current iterate for the state ENTERING step k
            X = jnp.broadcast_to(x_entry[None], (window, *x_entry.shape))
            t_rows = jnp.repeat(t_block, n)

            def sweep(_, carry):
                X, _ = carry
                Y = sweep_rows(X, t_rows)
                Xn = jnp.concatenate([x_entry[None], Y[:-1]], axis=0)
                return Xn, Y[-1]

            _, x_exit = jax.lax.fori_loop(
                0, sweeps, sweep, (X, x_entry), unroll=False
            )
            return x_exit, None

        x, _ = jax.lax.scan(block, x0_rows, ts)
        if cfg_scale is not None:
            x = jnp.concatenate([x, x], axis=0)
        return x

    return sample_fn
