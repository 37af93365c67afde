"""Distribution math for the variational bound (pure jnp).

Parity with reference `diffusion/diffusion_utils.py` (normal_kl,
approx_standard_normal_cdf, discretized/continuous gaussian log-likelihood).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def mean_flat(x: Array) -> Array:
    """Mean over all non-batch dims (reference `gaussian_diffusion.py:16-20`)."""
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)


def normal_kl(mean1, logvar1, mean2, logvar2) -> Array:
    """KL(N(mean1, exp(logvar1)) || N(mean2, exp(logvar2))), broadcasting."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray, (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: Array) -> Array:
    """Tanh approximation of the standard normal CDF."""
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x: Array, *, means: Array, log_scales: Array) -> Array:
    """Log-likelihood of a Gaussian discretized to 1/255 image bins.

    x is assumed to be uint8 values rescaled to [-1, 1]; edge bins integrate
    the tails (reference `diffusion_utils.py:62-88`).
    """
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, min=1e-12))
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta),
    )


def continuous_gaussian_log_likelihood(x: Array, *, means: Array, log_scales: Array) -> Array:
    """Continuous counterpart (reference `diffusion_utils.py:47-59`; unused by
    entry points — kept for API surface)."""
    z = (x - means) * jnp.exp(-log_scales)
    return -0.5 * (z**2 + math.log(2.0 * math.pi))
