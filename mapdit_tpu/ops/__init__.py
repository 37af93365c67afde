from mapdit_tpu.ops.mp import (
    magnitude,
    modulate,
    mp_silu,
    mp_sum,
    normalize,
    rotate_pairs,
)
from mapdit_tpu.ops.patch import patchify, unpatchify
from mapdit_tpu.ops.pos_embed import get_2d_sincos_pos_embed

__all__ = [
    "magnitude",
    "modulate",
    "mp_silu",
    "mp_sum",
    "normalize",
    "rotate_pairs",
    "patchify",
    "unpatchify",
    "get_2d_sincos_pos_embed",
]
