"""Magnitude-preserving math primitives (pure jnp functions).

Behavioral parity with the reference's `src/utils.py:6-34` (magnitude, mp_sum,
modulate, normalize, chunk_normalize), re-expressed as pure JAX functions.

Key semantic detail preserved from the reference: at model call sites the lerp
weight ``t`` of :func:`mp_sum` / :func:`modulate` is a *learned 0-dim tensor*
(the per-block gains). In the reference, ``math.sqrt((1-t)**2 + t**2)``
coerces that tensor to a Python float, so the magnitude-restoring denominator
is a constant w.r.t. autograd — gradient flows into ``t`` only through the
lerp numerator (`src/utils.py:15-16`). We reproduce that with
``lax.stop_gradient`` on the denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def magnitude(x: Array) -> Array:
    """Mean RMS magnitude over the last dim (reference `src/utils.py:6-8`).

    Debugging/property-test oracle: magnitude-preserving modules map
    unit-magnitude inputs to unit-magnitude outputs.
    """
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=-1)).mean()


def mp_sum(a: Array, b: Array, t=0.5) -> Array:
    """Magnitude-preserving sum: ``lerp(a, b, t) / sqrt((1-t)^2 + t^2)``.

    Matches reference `src/utils.py:15-16`. When ``t`` is a traced array the
    denominator is stop-gradiented (see module docstring).
    """
    lerp = a + (b - a) * t
    denom = jnp.sqrt((1.0 - t) ** 2 + t**2)
    if isinstance(t, (jax.core.Tracer, jax.Array)):
        denom = jax.lax.stop_gradient(denom)
    return lerp / denom


def modulate(x: Array, shift: Array, scale: Array, t=0.5) -> Array:
    """Conditioning injection: ``mp_sum(x * scale[:, None], shift[:, None], t)``.

    Matches reference `src/utils.py:11-12`; `shift`/`scale` are per-sample
    ``(N, D)`` vectors broadcast over the token axis of ``x`` ``(N, T, D)``.
    """
    return mp_sum(x * scale[:, None, :], shift[:, None, :], t=t)


def normalize(x: Array, eps: float = 1e-4) -> Array:
    """Row-normalize the last dim to norm ``sqrt(dim)`` (unit RMS rows).

    ``x * sqrt(dim) / (||x||_2 + eps)`` — matches reference
    `src/utils.py:19-23`. Note the reference's `chunk_normalize`
    (`src/utils.py:26-34`) is mathematically identical to this row-wise
    normalization (the chunk view regroups rows but the norm is still taken
    per output row), so a single primitive serves both MPLinear and
    MPLinearChunk.
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x * (jnp.sqrt(jnp.asarray(x.shape[-1], x.dtype)) / (norm + eps))


def mp_silu(x: Array) -> Array:
    """SiLU rescaled to unit second moment under N(0,1) inputs.

    ``silu(x) / 0.596`` — matches reference `src/basic/mp_silu.py:5-7`
    (constant from EDM2, arXiv 2312.02696).
    """
    return jax.nn.silu(x) / 0.596


def rotate_pairs(x: Array, theta: Array) -> Array:
    """Rotation modulation: rotate channel pairs of ``x`` by angles ``theta``.

    Implements the paper's rotation modulation (arXiv 2505.19122; no code in
    the reference snapshot — README.md:3 describes "learned rotations instead
    of traditional scaling or shifting"). Channels are split into D/2 pairs
    ``(x[..., 2i], x[..., 2i+1])`` and each pair is rotated by the 2D Givens
    rotation with per-sample angle ``theta[..., i]``. Rotations are exactly
    magnitude-preserving, which is why they compose cleanly with the MP
    design (no renormalization needed).

    Args:
        x: ``(N, T, D)`` activations, D even.
        theta: ``(N, D/2)`` per-sample rotation angles (broadcast over T).

    Returns: ``(N, T, D)`` rotated activations.
    """
    n, tok, d = x.shape
    xp = x.reshape(n, tok, d // 2, 2)
    cos = jnp.cos(theta)[:, None, :]  # (N, 1, D/2)
    sin = jnp.sin(theta)[:, None, :]
    x0, x1 = xp[..., 0], xp[..., 1]
    r0 = cos * x0 - sin * x1
    r1 = sin * x0 + cos * x1
    return jnp.stack([r0, r1], axis=-1).reshape(n, tok, d)
