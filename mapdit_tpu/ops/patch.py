"""Patchify / unpatchify (pure jnp; parity with reference `src/utils.py:37-59`).

The reference uses einops ``b c (h p1) (w p2) -> b (h w) (p1 p2 c)`` — note
the feature ordering (p1, p2, c) with channels fastest. We implement the same
layout with reshape/transpose so the tokenization is bit-identical and torch
checkpoints map over unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def patchify(x: Array, patch_size: int) -> Array:
    """(B, C, H, W) -> (B, (H/P)*(W/P), P*P*C), feature order (p1, p2, c)."""
    b, c, h, w = x.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = x.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # (b, gh, gw, p1, p2, c)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(x: Array, input_size: int, patch_size: int) -> Array:
    """(B, (H/P)*(W/P), P*P*C) -> (B, C, H, W); exact inverse of patchify."""
    b, t, f = x.shape
    p = patch_size
    g = input_size // p
    c = f // (p * p)
    x = x.reshape(b, g, g, p, p, c)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # (b, c, gh, p1, gw, p2)
    return x.reshape(b, c, g * p, g * p)
