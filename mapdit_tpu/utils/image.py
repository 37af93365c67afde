"""Image grid saving (replaces torchvision.utils.save_image at the
reference's call sites `sample.py:78`, `sample_ema.py:84`): NCHW float
batch -> PNG grid with value_range normalization."""

from __future__ import annotations

import numpy as np


def to_uint8(samples: np.ndarray, value_range=(-1.0, 1.0)) -> np.ndarray:
    """(N, C, H, W) floats -> (N, H, W, C) uint8, clamped + rescaled."""
    lo, hi = value_range
    x = np.clip(np.nan_to_num(samples), lo, hi)
    x = (x - lo) / (hi - lo)
    x = (x * 255.0).round().astype(np.uint8)
    return np.transpose(x, (0, 2, 3, 1))


def save_image_grid(
    samples: np.ndarray,
    path,
    nrow: int = 8,
    value_range=(-1.0, 1.0),
    padding: int = 2,
    format: str | None = None,
) -> None:
    """Save an (N, C, H, W) batch as a grid PNG with `nrow` images per row.

    ``path`` may be a filesystem path or a writable file object (pass
    ``format="PNG"`` then — serve.py streams grids into HTTP responses)."""
    from PIL import Image

    imgs = to_uint8(np.asarray(samples), value_range)
    n, h, w, c = imgs.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros(
        (ncol * (h + padding) + padding, nrow * (w + padding) + padding, c),
        dtype=np.uint8,
    )
    for i, img in enumerate(imgs):
        r, col = divmod(i, nrow)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = img
    if c == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path, format=format)
