"""Fused cosine-attention Pallas TPU kernel.

Replaces the reference's ``F.scaled_dot_product_attention`` call site
(`src/layers/attention.py:44-47`) with a single TPU kernel that folds the
cosine-attention q/k row normalization into the prologue — one VMEM
round-trip for normalize + logits + softmax + weighted sum instead of
separate HBM-bound normalize ops feeding a generic attention.

Shape regime (latent DiT): T = (input/patch)^2 ∈ [16, 1024] tokens,
head_dim ∈ {64, 72, ...}. A whole (T, D') slice fits VMEM comfortably
(256×128×4B = 128 KiB), so the kernel processes one (batch, head) pair per
grid step with full-T blocks — no flash-style tiling needed at these sizes;
the grid dimension provides the parallelism across B*H.

Backward: custom VJP that recomputes through the XLA reference path —
correctness-first; the fwd kernel is the sampling hot path (no grads).
Falls back to interpreter mode off-TPU so tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, cosine: bool):
    """G (batch, head) pairs per grid step; per-pair attention as a batched
    contraction so Mosaic can pipeline the small matmuls back to back."""
    q = q_ref[...].astype(jnp.float32)  # (G, T, D')
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    if cosine:
        # normalize rows to norm sqrt(D') (mapdit_tpu.ops.mp.normalize)
        d = q.shape[-1]
        sqrt_d = jnp.sqrt(jnp.float32(d))
        q = q * (sqrt_d / (jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)) + 1e-4))
        k = k * (sqrt_d / (jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True)) + 1e-4))

    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, T, T)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o_ref[...] = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _attention_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, cosine: bool, t: int
):
    """v3: two heads packed along the token (sublane) axis per pair — each
    block is (G, 2T, D') so the logits matmul produces full (2T, 2T) =
    (128, 128) MXU tiles at T=64 instead of quarter-filled (64, 64) ones.
    Cross-head logit blocks are masked to -inf before the softmax
    (block-diagonal attention). 2x logit FLOP overhead traded for 4x better
    MXU geometry — the fix BENCH_NOTES r1 prescribed."""
    q = q_ref[...]  # (G, 2T, D'), input dtype
    k = k_ref[...]
    v = v_ref[...]

    if cosine:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        d = q.shape[-1]
        sqrt_d = jnp.sqrt(jnp.float32(d))
        q = (qf * (sqrt_d / (jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True)) + 1e-4))).astype(q.dtype)
        k = (kf * (sqrt_d / (jnp.sqrt(jnp.sum(kf * kf, axis=-1, keepdims=True)) + 1e-4))).astype(k.dtype)

    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, 2T, 2T)

    tt = 2 * t
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 0) // t
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (tt, tt), 1) // t
    logits = jnp.where((row_blk == col_blk)[None], logits, -1e30)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _pick_group(n: int, cands=(8, 4, 2)) -> int:
    for cand in cands:
        if n % cand == 0:
            return cand
    return 1


def _fused_attention_fwd_impl(
    q: Array, k: Array, v: Array, scale: float, cosine: bool, version: str = "auto"
) -> Array:
    b, h, t, d = q.shape
    bh = b * h
    # Packing pays only while 2T fits one 128-row tile: at larger T the
    # per-pair matmuls already fill the MXU and the 2x logit-FLOP overhead
    # dominates (measured: T=256 v3 79.3 vs v2-style 106 steps/s in-chain).
    packable = h % 2 == 0 and t % 8 == 0 and 2 * t <= 128
    if version == "auto":
        version = "v3" if packable else "v2"
    assert version in ("v2", "v3"), version
    if version == "v3" and not packable:
        version = "v2"

    if version == "v3":
        # head pairs (2i, 2i+1) stacked along the token axis: (BH/2, 2T, D')
        bh2 = bh // 2
        qf, kf, vf = (z.reshape(bh2, 2 * t, d) for z in (q, k, v))
        g = _pick_group(bh2)
        out = pl.pallas_call(
            functools.partial(
                _attention_kernel_packed, scale=scale, cosine=cosine, t=t
            ),
            grid=(bh2 // g,),
            in_specs=[
                pl.BlockSpec((g, 2 * t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_specs=pl.BlockSpec((g, 2 * t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh2, 2 * t, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * bh2 * ((2 * t) ** 2 * d * 2),
                bytes_accessed=4 * bh * t * d * 4,
                transcendentals=bh2 * (2 * t) ** 2,
            ),
            interpret=_interpret(),
        )(qf, kf, vf)
        return out.reshape(b, h, t, d)

    qf, kf, vf = (z.reshape(bh, t, d) for z in (q, k, v))
    # G pairs per grid step (v2): fewer, fatter programs
    g = _pick_group(bh)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, cosine=cosine),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (t * t * d * 2),
            bytes_accessed=4 * bh * t * d * 4,
            transcendentals=bh * t * t,
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


def _xla_reference(q, k, v, scale, cosine):
    from mapdit_tpu.ops.attention import _xla_attention
    from mapdit_tpu.ops.mp import normalize

    if cosine:
        q = normalize(q)
        k = normalize(k)
    return _xla_attention(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention(
    q: Array, k: Array, v: Array, scale: float, cosine: bool = True,
    version: str = "auto",
) -> Array:
    """``version``: "auto" picks v3 (2-head token packing) when shapes allow,
    else v2 (G pairs per grid step); "v2"/"v3" force a kernel for A/Bs."""
    return _fused_attention_fwd_impl(q, k, v, scale, cosine, version)


def _fwd(q, k, v, scale, cosine, version):
    return _fused_attention_fwd_impl(q, k, v, scale, cosine, version), (q, k, v)


def _bwd(scale, cosine, version, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale, cosine), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
