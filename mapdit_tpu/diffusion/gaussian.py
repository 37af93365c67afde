"""Gaussian diffusion as device-resident tables + pure functions.

TPU-native redesign of the reference `diffusion/gaussian_diffusion.py`:

  * All coefficient tables are computed host-side in **numpy float64**
    (reference precedent, `gaussian_diffusion.py:166-201`), then stored as
    float32 device arrays inside a `flax.struct` pytree. The reference's
    `_extract_into_tensor` crosses host→device on *every* diffusion call
    (`gaussian_diffusion.py:861-873`); here extraction is a device gather.
  * Samplers are `jax.lax.scan` loops over the timestep axis with the full
    per-step model forward fused into one XLA program — the reference runs
    250 Python iterations with per-step host transfers
    (`gaussian_diffusion.py:490-511`).
  * Timestep respacing is an index-remap table folded into the model call
    (replaces the reference's `_WrappedModel`, `respace.py:117-129`).

The struct is a pytree: it can be closed over by jit, donated, or passed as
an argument; the static mode fields (mean/var/loss type) are hashable aux
data so jit re-specializes per configuration.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mapdit_tpu.diffusion.dmath import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)

Array = jax.Array
ModelFn = Callable[..., Array]

# Model mean parameterizations (reference ModelMeanType, gd.py:23-30)
PREVIOUS_X, START_X, EPSILON = "previous_x", "start_x", "epsilon"
# Variance parameterizations (reference ModelVarType, gd.py:33-43)
LEARNED, FIXED_SMALL, FIXED_LARGE, LEARNED_RANGE = (
    "learned",
    "fixed_small",
    "fixed_large",
    "learned_range",
)
# Loss types (reference LossType, gd.py:46-55)
MSE, RESCALED_MSE, KL, RESCALED_KL = "mse", "rescaled_mse", "kl", "rescaled_kl"


def dynamic_threshold_fn(percentile: float = 0.995, floor: float = 1.0):
    """Imagen-style dynamic thresholding (arXiv 2205.11487 §2.3) adapted to
    latent space: a ``denoised_fn`` that clips each sample's x0 estimate to
    its own ``percentile``-quantile of |x0| (floored at ``floor``) — WITHOUT
    the paper's pixel-space /s rescale, which would rescale latents the VAE
    decoder expects unshrunk. Bounds the x0-feedback loop that makes
    undertrained or high-guidance chains diverge (an exploding x0 estimate
    re-enters the update and compounds multiplicatively at high t), while
    leaving in-range estimates bit-identical. Beyond-reference knob; the
    reference's only control is the hard [-1, 1] clamp (``clip_denoised``,
    /root/reference/diffusion/gaussian_diffusion.py:317-322)."""
    assert 0.0 < percentile <= 1.0, percentile

    def fn(x0: Array) -> Array:
        flat = jnp.abs(x0.reshape(x0.shape[0], -1))
        s = jnp.quantile(flat, percentile, axis=1)
        s = jnp.maximum(s, floor).reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.clip(x0, -s, s)

    return fn


@struct.dataclass
class GaussianDiffusion:
    """Diffusion process: static mode switches + float32 coefficient tables."""

    mean_type: str = struct.field(pytree_node=False)
    var_type: str = struct.field(pytree_node=False)
    loss_type: str = struct.field(pytree_node=False)
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)

    betas: Array
    log_betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    alphas_cumprod_next: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    log_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    fixed_large_variance: Array
    fixed_large_log_variance: Array
    # Respacing: compressed index -> original timestep (identity when not
    # respaced). The model always sees original-process timesteps.
    timestep_map: Array

    # ------------------------------------------------------------------ #
    # construction

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        *,
        mean_type: str = EPSILON,
        var_type: str = LEARNED_RANGE,
        loss_type: str = MSE,
        timestep_map: Optional[np.ndarray] = None,
        original_num_steps: Optional[int] = None,
    ) -> "GaussianDiffusion":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        n = betas.shape[0]

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)

        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        # n == 1: the only posterior variance is exactly 0 -> logvar -inf is
        # intended (the t==0 step never adds noise); silence numpy's warning.
        with np.errstate(divide="ignore"):
            post_logvar_clipped = (
                np.log(np.append(post_var[1], post_var[1:]))
                if n > 1
                else np.log(post_var)
            )
        fixed_large_var = np.append(post_var[1], betas[1:]) if n > 1 else betas

        if timestep_map is None:
            timestep_map = np.arange(n)
        if original_num_steps is None:
            original_num_steps = n

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(
            mean_type=mean_type,
            var_type=var_type,
            loss_type=loss_type,
            num_timesteps=n,
            original_num_steps=int(original_num_steps),
            betas=f32(betas),
            log_betas=f32(np.log(betas)),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            alphas_cumprod_next=f32(acp_next),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(post_logvar_clipped),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            fixed_large_variance=f32(fixed_large_var),
            fixed_large_log_variance=f32(np.log(fixed_large_var)),
            timestep_map=jnp.asarray(timestep_map, jnp.int32),
        )

    # ------------------------------------------------------------------ #
    # helpers

    def _extract(self, table: Array, t: Array, ndim: int) -> Array:
        """Device-resident gather + broadcast (vs reference's per-call
        numpy→device transfer, `gaussian_diffusion.py:861-873`)."""
        return table[t].reshape(t.shape[0], *([1] * (ndim - 1)))

    def model_timesteps(self, t: Array) -> Array:
        """Compressed -> original timesteps; what the model consumes
        (replaces `respace._WrappedModel`). Raw floats 0..999, no rescale."""
        return self.timestep_map[t].astype(jnp.float32)

    def _call(self, model_fn: ModelFn, x: Array, t: Array, model_kwargs) -> Array:
        return model_fn(x, self.model_timesteps(t), **(model_kwargs or {}))

    # ------------------------------------------------------------------ #
    # forward process q

    def q_mean_variance(self, x_start: Array, t: Array):
        nd = x_start.ndim
        mean = self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = self._extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = self._extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """sqrt(acp) x0 + sqrt(1-acp) eps (reference `gd.py:215-230`)."""
        nd = x_start.ndim
        return (
            self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start: Array, x_t: Array, t: Array):
        nd = x_t.ndim
        mean = (
            self._extract(self.posterior_mean_coef1, t, nd) * x_start
            + self._extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = self._extract(self.posterior_variance, t, nd)
        log_variance = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # ------------------------------------------------------------------ #
    # reverse process p

    def _predict_xstart_from_eps(self, x_t: Array, t: Array, eps: Array) -> Array:
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_eps_from_xstart(self, x_t: Array, t: Array, pred_xstart: Array) -> Array:
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def p_mean_variance_from_output(
        self,
        model_output: Array,
        x: Array,
        t: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
    ) -> Dict[str, Array]:
        """Turn a raw model output into p(x_{t-1} | x_t) statistics
        (reference `gd.py:254-332`, factored so the frozen-output VB term
        reuses it without a fake model closure)."""
        nd = x.ndim
        c = x.shape[1]

        if self.var_type in (LEARNED, LEARNED_RANGE):
            model_output, var_values = jnp.split(model_output, 2, axis=1)
            if self.var_type == LEARNED_RANGE:
                min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
                max_log = self._extract(self.log_betas, t, nd)
                frac = (var_values + 1.0) / 2.0  # [-1,1] -> [min_var, max_var]
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
            else:
                model_log_variance = var_values
            model_variance = jnp.exp(model_log_variance)
        elif self.var_type == FIXED_LARGE:
            model_variance = self._extract(self.fixed_large_variance, t, nd)
            model_log_variance = self._extract(self.fixed_large_log_variance, t, nd)
        else:  # FIXED_SMALL
            model_variance = self._extract(self.posterior_variance, t, nd)
            model_log_variance = self._extract(self.posterior_log_variance_clipped, t, nd)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.mean_type == START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output)
            )
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs=None,
    ) -> Dict[str, Array]:
        out = self._call(model_fn, x, t, model_kwargs)
        return self.p_mean_variance_from_output(
            out, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )

    # guidance hooks (reference `gd.py:348-376`)

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None) -> Array:
        gradient = cond_fn(x, self.model_timesteps(t), **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1.0 - alpha_bar) * cond_fn(
            x, self.model_timesteps(t), **(model_kwargs or {})
        )
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # ------------------------------------------------------------------ #
    # ancestral (DDPM) sampling

    def p_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        rng: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        noise_fn=None,
    ) -> Dict[str, Array]:
        """One ancestral step: mean + 1{t!=0} exp(logvar/2) eps
        (reference `gd.py:376-417`).

        ``noise_fn(t, shape)`` overrides the step noise — the golden-input
        injection hook for cross-framework sampler parity (PyTorch and JAX
        PRNG streams cannot match; SURVEY.md §7 hard-part #2).
        """
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs)
        if noise_fn is not None:
            noise = noise_fn(t, x.shape).astype(x.dtype)
        else:
            noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        noise: Array,
        rng: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        noise_fn=None,
    ) -> Array:
        """Full denoising chain as one `lax.scan` (the north-star kernel-level
        win over the reference's 250 host-driven iterations, SURVEY.md §7.3)."""

        def body(carry, t_scalar):
            x, key = carry
            key, step_key = jax.random.split(key)
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            out = self.p_sample(
                model_fn, x, t, step_key,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs, noise_fn=noise_fn,
            )
            return (out["sample"], key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(body, (noise, rng), ts)
        return x

    def p_sample_loop_fast(
        self,
        model_fn: ModelFn,
        noise: Array,
        rng: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs=None,
        noise_fn=None,
        unroll: int = 1,
        step_slice: Optional[Tuple[int, int]] = None,
        return_carry: bool = False,
    ) -> Array:
        """DDPM chain specialized for the default EPSILON+LEARNED_RANGE mode.

        Mathematically identical to :meth:`p_sample_loop` (same ops, same
        order) but all per-step coefficients enter the scan as prestacked
        0-d scalars through ``xs`` instead of per-step table gathers with
        (B, 1, 1, 1) broadcasts — measured ~20% of per-step time at DiT-S/2
        shapes was this bookkeeping (docs/BENCH_NOTES.md). ``unroll`` is
        forwarded to lax.scan (per-iteration loop overhead vs program size).

        ``step_slice=(a, b)`` runs only chain positions [a, b) of the
        descending-t chain (position 0 is t = num_timesteps-1); with
        ``return_carry`` the call returns ``(x, key)`` so a caller can
        stitch segments with different model_fns into one exact chain
        (runtime.py's limited-interval CFG uses this; chaining the carried
        key reproduces the unsegmented RNG stream bit-for-bit). An empty
        slice is a legal zero-length scan that passes the carry through.
        """
        assert self.mean_type == EPSILON and self.var_type == LEARNED_RANGE
        n = noise.shape[0]
        lo, hi = step_slice if step_slice is not None else (0, self.num_timesteps)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)[lo:hi]
        coefs = (
            ts,
            self.timestep_map[ts].astype(jnp.float32),
            self.sqrt_recip_alphas_cumprod[ts],
            self.sqrt_recipm1_alphas_cumprod[ts],
            self.posterior_mean_coef1[ts],
            self.posterior_mean_coef2[ts],
            self.posterior_log_variance_clipped[ts],
            self.log_betas[ts],
            (ts != 0).astype(noise.dtype),
        )

        def body(carry, c):
            x, key = carry
            t_idx, model_t, sra, srm1, pc1, pc2, min_log, max_log, nonzero = c
            key, step_key = jax.random.split(key)
            out = model_fn(x, jnp.full((n,), model_t), **(model_kwargs or {}))
            eps_hat, var_values = jnp.split(out, 2, axis=1)
            frac = (var_values + 1.0) / 2.0
            log_variance = frac * max_log + (1.0 - frac) * min_log
            pred_xstart = sra * x - srm1 * eps_hat
            if denoised_fn is not None:
                pred_xstart = denoised_fn(pred_xstart)
            if clip_denoised:
                pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
            mean = pc1 * pred_xstart + pc2 * x
            if noise_fn is not None:
                # compressed timestep indices, matching p_sample's hook
                step_noise = noise_fn(jnp.full((n,), t_idx), x.shape).astype(x.dtype)
            else:
                step_noise = jax.random.normal(step_key, x.shape, x.dtype)
            x = mean + nonzero * jnp.exp(0.5 * log_variance) * step_noise
            return (x, key), None

        carry, _ = jax.lax.scan(body, (noise, rng), coefs, unroll=unroll)
        return carry if return_carry else carry[0]

    def p_sample_loop_progressive(
        self, model_fn: ModelFn, noise: Array, rng: Array, **kw
    ) -> Dict[str, Array]:
        """Scan that also stacks every intermediate sample/pred_xstart
        ((T, N, C, H, W) outputs) — the generator-style reference API
        (`gd.py:464-511`) mapped to functional form."""

        def body(carry, t_scalar):
            x, key = carry
            key, step_key = jax.random.split(key)
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            out = self.p_sample(model_fn, x, t, step_key, **kw)
            return (out["sample"], key), out

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, outs = jax.lax.scan(body, (noise, rng), ts)
        return outs

    # ------------------------------------------------------------------ #
    # DDIM sampling (reference `gd.py:513-680`)

    def ddim_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        rng: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ) -> Dict[str, Array]:
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])

        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
            * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1.0 - alpha_bar_prev - sigma**2) * eps
        )
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (nd - 1)))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ) -> Dict[str, Array]:
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        nd = x.ndim
        eps = (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x
            - out["pred_xstart"]
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = self._extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1.0 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn: ModelFn,
        noise: Array,
        rng: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ) -> Array:
        def body(carry, t_scalar):
            x, key = carry
            key, step_key = jax.random.split(key)
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            out = self.ddim_sample(
                model_fn, x, t, step_key,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs, eta=eta,
            )
            return (out["sample"], key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(body, (noise, rng), ts)
        return x

    # ------------------------------------------------------------------ #
    # losses

    def _vb_terms_from_output(
        self, model_output: Array, x_start: Array, x_t: Array, t: Array,
        clip_denoised: bool,
    ) -> Tuple[Array, Array]:
        """KL(q||p) in bits, decoder NLL at t=0 (reference `gd.py:682-713`)."""
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance_from_output(
            model_output, x_t, t, clip_denoised=clip_denoised
        )
        kl = mean_flat(
            normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
        ) / math.log(2.0)
        decoder_nll = mean_flat(
            -discretized_gaussian_log_likelihood(
                x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
            )
        ) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl), out["pred_xstart"]

    def vb_terms_bpd(
        self, model_fn: ModelFn, x_start: Array, x_t: Array, t: Array,
        clip_denoised: bool = True, model_kwargs=None,
    ) -> Dict[str, Array]:
        out = self._call(model_fn, x_t, t, model_kwargs)
        output, pred_xstart = self._vb_terms_from_output(
            out, x_start, x_t, t, clip_denoised
        )
        return {"output": output, "pred_xstart": pred_xstart}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: Array,
        t: Array,
        model_kwargs=None,
        noise: Optional[Array] = None,
        rng: Optional[Array] = None,
    ) -> Dict[str, Array]:
        """Per-sample training loss (reference `gd.py:715-787`).

        LEARNED_RANGE default: loss = mse(eps) + vb, where the VB term sees a
        stop-gradiented mean so variance learning can't corrupt the eps
        objective (the reference's frozen_out trick, `gd.py:758-765`).
        """
        if noise is None:
            assert rng is not None, "training_losses needs noise or rng"
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        terms: Dict[str, Array] = {}

        if self.loss_type in (KL, RESCALED_KL):
            terms["loss"] = self.vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False,
                model_kwargs=model_kwargs,
            )["output"]
            if self.loss_type == RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = self._call(model_fn, x_t, t, model_kwargs)

        if self.var_type in (LEARNED, LEARNED_RANGE):
            eps_out, var_values = jnp.split(model_output, 2, axis=1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(eps_out), var_values], axis=1
            )
            vb, _ = self._vb_terms_from_output(
                frozen, x_start, x_t, t, clip_denoised=False
            )
            if self.loss_type == RESCALED_MSE:
                vb = vb * (self.num_timesteps / 1000.0)
            terms["vb"] = vb
            model_output = eps_out

        target = {
            PREVIOUS_X: lambda: self.q_posterior_mean_variance(x_start, x_t, t)[0],
            START_X: lambda: x_start,
            EPSILON: lambda: noise,
        }[self.mean_type]()
        terms["mse"] = mean_flat(jnp.square(target - model_output))
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    # ------------------------------------------------------------------ #
    # full-chain VLB evaluation (reference `gd.py:789-858`)

    def prior_bpd(self, x_start: Array) -> Array:
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_logvar, 0.0, 0.0)
        return mean_flat(kl) / math.log(2.0)

    def calc_bpd_loop(
        self, model_fn: ModelFn, x_start: Array, rng: Array,
        clip_denoised: bool = True, model_kwargs=None,
    ) -> Dict[str, Array]:
        """VLB over the whole chain as a scan (reference does a Python loop)."""

        def body(key, t_scalar):
            key, nkey = jax.random.split(key)
            t = jnp.full((x_start.shape[0],), t_scalar, jnp.int32)
            noise = jax.random.normal(nkey, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self.vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=clip_denoised,
                model_kwargs=model_kwargs,
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return key, (
                out["output"],
                mean_flat(jnp.square(out["pred_xstart"] - x_start)),
                mean_flat(jnp.square(eps - noise)),
            )

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, ts)
        vb, xstart_mse, mse = (jnp.swapaxes(a, 0, 1) for a in (vb, xstart_mse, mse))
        prior = self.prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior,
            "prior_bpd": prior,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }
