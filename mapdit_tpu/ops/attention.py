"""Multi-head attention compute paths.

The reference reaches fused attention through
``F.scaled_dot_product_attention`` (`src/layers/attention.py:47`) — third-party
CUDA kernels. The TPU-native equivalents here are:

  * ``xla``    — einsum + softmax left to the XLA fusion pipeline. For the
                 tiny sequence lengths of latent DiT (T = (input/patch)^2,
                 64-256 tokens) XLA already produces near-roofline code; this
                 is also the CPU/test path.
  * ``pallas`` — a hand-written fused cosine-attention kernel
                 (``mapdit_tpu.ops.pallas.attention``) with q/k normalization
                 folded into the kernel prologue.

``dot_product_attention(..., impl="auto")`` picks pallas on TPU when the
shapes are kernel-friendly, else xla.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdit_tpu.ops.mp import normalize

Array = jax.Array


def _xla_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """softmax(q k^T * scale) v over (B, H, T, D') operands."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    # Softmax in fp32 regardless of compute dtype: cheap at these sizes and
    # removes bf16 renormalization error from the parity budget.
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    *,
    cosine: bool = False,
    impl: str = "auto",
) -> Array:
    """Attention over (B, H, T, D') tensors.

    With ``cosine=True``, q and k rows are normalized to norm sqrt(D') first
    (reference `src/layers/attention.py:44-45`); combined with
    ``scale = 1/sqrt(D')`` the logits are sqrt(D')-scaled cosine similarities.
    """
    if impl == "auto":
        # Measured on v5e (DiT-S/2, T=64, D'=64, bf16, 250-step protocol):
        # the XLA fusion path sustains ~417 steps/s vs 366 for the v2 kernel
        # and the v3 2-head-packed kernel (see docs/BENCH_NOTES.md round-2
        # A/B); XLA batches the whole (B*H) contraction and fuses the
        # surrounding elementwise stages. The kernels stay opt-in
        # (--attention-impl pallas / pallas_v2 / pallas_v3).
        impl = "xla"

    if impl.startswith("pallas"):
        from mapdit_tpu.ops.pallas.attention import fused_attention

        version = {"pallas": "auto", "pallas_v2": "v2", "pallas_v3": "v3"}[impl]
        return fused_attention(q, k, v, scale, cosine, version)

    if cosine:
        q = normalize(q)
        k = normalize(k)
    return _xla_attention(q, k, v, scale)
