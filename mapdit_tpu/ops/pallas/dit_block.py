"""Whole-DiT-block Pallas megakernel: one VMEM residency per block.

The r02 trace question (VERDICT #1): XLA runs a DiT block as ~8 HBM-separated
stages (modulation GEMM, modulate, qkv GEMM, attention, out GEMM, residual,
fc1, silu, fc2, residual), each re-streaming the (N, T, D) activation through
HBM. This kernel executes the ENTIRE block — both modulations, cosine
attention, the MLP, both gated MP residuals — for a group of G samples with
x and all five weight matrices VMEM-resident, so the activation touches HBM
exactly twice per block (read x, write x').

Reference math: `src/blocks/dit_block.py:10-37` (modulation order
shift/scale/gate x {msa, mlp}, learned gains as modulate lerp weights,
fixed t=0.3 MP residuals), `src/layers/attention.py:9-51` (cosine q/k
normalization, explicit 1/sqrt(head_dim) scale).

Scope: the MP + adaln family with folded (pre-normalized) weights — the
sampling fast path. Training-safe via a custom VJP that recomputes through
the plain jnp reference ops. Parity + A/B wiring: DiTBlock dispatches here
when ``cfg.block_kernel == "mega"``.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_RES_T = 0.3
_RES_DENOM = math.sqrt((1 - _RES_T) ** 2 + _RES_T**2)
_SILU_DIV = 0.596
_NORM_EPS = 1e-4


def _modulate(x, shift, scale, gain):
    # mp_sum(x*scale, shift, t=gain); gain is a traced scalar — the
    # denominator is constant w.r.t. grad by the custom VJP construction
    xs = x * scale
    denom = jnp.sqrt((1.0 - gain) ** 2 + gain**2)
    return (xs + (shift - xs) * gain) / denom


def _cosine_scales(qkv, d, heads, hd):
    """Per-row q/k normalize scales ``sqrt(hd) / (||row|| + eps)`` for all
    2*heads head-slices in ONE f32 MXU contraction.

    Reference normalize() (`src/utils.py:19-23`) is a per-head cross-lane
    reduce; kernel_ablation (r03s4, BENCH_NOTES) measured those reduces at
    0.38 ms/step of the 1.80 ms headline chain. Squaring the flat q|k
    lanes once and contracting with a (2D, 2*heads) block-indicator rides
    the reduction on the MXU instead; the sqrt/reciprocal then run on a
    tiny (G*T, 2*heads) array. f32 GEMM on purpose: bf16 operands would
    cost ~0.4% norm error, past the 2e-4 parity tolerance."""
    qk = qkv[:, : 2 * d]
    sq = qk * qk  # (G*T, 2D), one VPU pass
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (2 * d, 2 * heads), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (2 * d, 2 * heads), 1)
    ).astype(jnp.float32)
    sums = jax.lax.dot_general(
        sq,
        blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*T, 2*heads) = per-row ||q_h||^2, ||k_h||^2
    return math.sqrt(hd) / (jnp.sqrt(sums) + _NORM_EPS)


def _gemm_reduce_pays(rows, d):
    """Geometry gate for riding cross-lane reductions on the MXU: the
    block-indicator/ones contractions have M = G*T rows and K = 2D depth —
    one M-tile with many serial K-tiles is latency-bound and LOSES (XL's
    G=2: 128 x 4608-deep, measured 74.3 -> 66.9 steps/s before this gate)
    while sublane-filled M wins (S 512x768 and B 512x1536 geometries,
    +3.6% headline). Require 8*M >= 2D."""
    return 8 * rows >= 2 * d



def _pack_mode() -> bool:
    # paired-sample attention core (see _attention_core), ON by default:
    # neutral when first A/B'd (+0.4%, r03s4 queue), but once the VPU
    # reduce/divide cuts exposed the quarter-filled (64, 64) logit tiles
    # it measures +3.9% on chip (579.5 -> 602.3 steps/s headline).
    # MAPDIT_MEGA_PACK=0 restores the unpacked core for A/B; shapes that
    # cannot pack (odd G, 2T > 128) fall back automatically either way.
    return os.environ.get("MAPDIT_MEGA_PACK", "1") == "1"


def _vmem_mb() -> int:
    """MAPDIT_MEGA_VMEM_MB: Mosaic scoped-VMEM limit for the forward
    kernels, in MB (default 16 = Mosaic's own default). v5e has 128 MB of
    physical VMEM per core; raising the scope lets bigger weight sets
    (whole-block at B-scale: 21 MB) or bigger sample groups stay resident —
    at the cost of the headroom Mosaic uses for double-buffering. Group
    budgets below scale with it; 16 reproduces the calibrated r03 defaults
    exactly."""
    return int(os.environ.get("MAPDIT_MEGA_VMEM_MB", "16"))


def _compiler_params():
    mb = _vmem_mb()
    if mb == 16:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 2**20)


def _skips() -> frozenset:
    """MAPDIT_MEGA_SKIP: comma-set of kernel stages to elide AT TRACE TIME —
    a measurement-only knob for tools/kernel_ablation.py (the jax.profiler
    trace sees the megakernel as one opaque custom-call; skip-variant
    steps/s deltas attribute the in-kernel time per stage). Values:
    ``norm`` (cosine q/k normalize), ``softmax`` (logit scaling instead),
    ``attn-core`` (logits/softmax/attn-v; keeps qkv + out GEMMs),
    ``attn`` (whole attention branch), ``mlp`` (whole MLP branch),
    ``mod`` (modulation GEMM + modulate; gates/scales become identity).
    NEVER set in production: outputs are numerically meaningless."""
    return frozenset(
        s for s in os.environ.get("MAPDIT_MEGA_SKIP", "").split(",") if s
    )


def _attention_core(qkv, g, t, d, heads, dtype):
    """Cosine attention over contiguous lane head-slices of a flat
    ``qkv`` (G*T, 3D) f32 array; returns pre-out-proj ``attn`` (G*T, D).

    Two shapes of the same math:

    * per-head: G-batched (T, hd) x (hd, T) contractions — transpose-free,
      but at the shipped T=64/hd=64 geometry every logits matmul is a
      quarter-filled (64, 64) MXU tile;
    * paired (MAPDIT_MEGA_PACK=1): two SAMPLES merged along the token
      (sublane) axis per contraction — a pure leading-dim reshape
      (G, T, hd) -> (G/2, 2T, hd), no data movement — producing full
      (128, 128) logit tiles at T=64 with the cross-sample quadrants
      masked to -inf before the softmax (block-diagonal attention). Same
      2x-logit-FLOPs-for-4x-MXU-geometry trade as the v3 standalone
      kernel's head packing (ops/pallas/attention.py:65), but expressible
      inside the kernel (Mosaic cannot lower a sublane concat of two
      different lane slices; it lowers this reshape for free).
    """
    hd = d // heads
    inv_hd = 1.0 / math.sqrt(hd)

    skips = _skips()
    gemm_reduce = _gemm_reduce_pays(g * t, d)
    # "norm" in skips: ablation probe only (see _skips) — no normalization
    scales = (
        _cosine_scales(qkv, d, heads, hd)
        if gemm_reduce and "norm" not in skips
        else None
    )

    def head_slices(hi):
        # q/k enter the GEMM RAW — the cosine normalize folds into the
        # logits below ((q/|q|).(k/|k|) == (q.k)/(|q||k|)); only the
        # per-row scale VECTORS are computed here, never scaled buffers
        q = qkv[:, 0 * d + hi * hd : 0 * d + (hi + 1) * hd].reshape(g, t, hd)
        k = qkv[:, 1 * d + hi * hd : 1 * d + (hi + 1) * hd].reshape(g, t, hd)
        v = qkv[:, 2 * d + hi * hd : 2 * d + (hi + 1) * hd]
        if "norm" in skips:  # ablation probe only
            qs = ks = None
        elif scales is not None:
            qs = scales[:, hi].reshape(g, t)
            ks = scales[:, heads + hi].reshape(g, t)
        else:
            # small-M fallback (gemm_reduce gate, XL's G=2): per-head VPU
            # reduce AND pre-GEMM scaling. Folding these scales into the
            # logits was A/B'd on chip at XL: fold 74.3 vs this form 74.0
            # steps/s same-session (both within the 74.0-75.8 cross-session
            # tunnel band) — a wash at T==hd geometry, so this branch keeps
            # the form the 75.8 record was measured on
            qs = ks = None
            q = q * (math.sqrt(hd) / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + _NORM_EPS))
            k = k * (math.sqrt(hd) / (jnp.sqrt(jnp.sum(k * k, -1, keepdims=True)) + _NORM_EPS))
        return q, k, v.reshape(g, t, hd), qs, ks

    pack = _pack_mode() and g % 2 == 0 and t % 8 == 0 and 2 * t <= 128
    if pack:
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (2 * t, 2 * t), 0) // t
        col_blk = jax.lax.broadcasted_iota(jnp.int32, (2 * t, 2 * t), 1) // t
        same_blk = (row_blk == col_blk)[None]

    head_outs = []
    for hi in range(heads):
        q, k, v, qs, ks = head_slices(hi)
        if pack:
            q = q.reshape(g // 2, 2 * t, hd)
            k = k.reshape(g // 2, 2 * t, hd)
            v = v.reshape(g // 2, 2 * t, hd)
        logits = jax.lax.dot_general(
            q.astype(dtype),
            k.astype(dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv_hd  # (G, T, T) | packed (G/2, 2T, 2T)
        if qs is not None:
            # Post-GEMM cosine normalize (the r03s5 kernel_ablation showed
            # the pre-GEMM q/k scale-multiplies as the largest remaining
            # VPU item, 0.266 ms/step of 1.610): scaling the LOGITS by the
            # outer product of the per-row scales is the same math —
            # (q/|q|).(k/|k|) == (q.k)/(|q||k|) — and the two broadcast
            # multiplies fuse into the exp's existing elementwise chain
            # over the logit tile instead of materializing scaled (T, hd)
            # q/k buffers per head. The max-free-softmax bound still holds:
            # the scaled logits are value-identical to the pre-scaled ones.
            if pack:
                qs = qs.reshape(g // 2, 2 * t)
                ks = ks.reshape(g // 2, 2 * t)
            logits = logits * qs[:, :, None] * ks[:, None, :]
        if pack:
            logits = jnp.where(same_blk, logits, -1e30)
        if "softmax" in skips:  # ablation probe only
            probs, ex, denom = logits * (1.0 / t), None, None
        else:
            # max-free softmax: cosine logits are PROVABLY bounded —
            # q/k rows have norm sqrt(hd), so |q.k| <= hd and with the
            # 1/sqrt(hd) scale |logits| <= sqrt(hd). Shifting by that
            # constant keeps exp args in [-2*sqrt(hd), 0] (no overflow,
            # and f32's exponent preserves relative precision), which
            # drops jax.nn.softmax's max cross-lane reduce + broadcast
            # subtract. Packed -1e30 mask lanes underflow to exactly 0,
            # as the mask intends.
            # … and the normalizing row-sum reduce rides the MXU as an
            # ones-vector contraction when the geometry pays (same
            # kernel_ablation rationale and gate as _cosine_scales).
            ex = jnp.exp(logits - math.sqrt(hd))
            if gemm_reduce:
                denom = jax.lax.dot_general(
                    ex,
                    jnp.ones((ex.shape[-1], 1), jnp.float32),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (G, T, 1) | packed (G/2, 2T, 1)
            else:
                denom = jnp.sum(ex, axis=-1, keepdims=True)
            # normalize AFTER the attn-v GEMM (softmax(l) @ v ==
            # (exp(l) @ v) / rowsum): the (…, 1) reciprocal then
            # broadcasts over hd output lanes instead of the T (packed
            # 2T) logit lanes — half the normalize-multiply domain at
            # the shipped T=64/hd=64 pack geometry. This is the safe
            # form of the recorded "ones-column" open edge (BENCH_NOTES
            # r03s4): same fusion payoff, no lane-concat relayout.
            probs = None
        mat = ex if probs is None else probs
        o = jax.lax.dot_general(
            mat.astype(dtype),
            v.astype(dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, T, hd) | packed (G/2, 2T, hd) — off-quadrant weights are 0
        if probs is None:
            o = o * (1.0 / denom)
        head_outs.append(o.reshape(g, t, hd) if pack else o)
    return jnp.concatenate(head_outs, axis=-1).reshape(g * t, d)


def _row_select(ref, row0, g, dtype):
    """Rows [row0, row0+g) of a (N, D) VMEM ref via a one-hot matmul —
    Mosaic cannot statically prove alignment of a dynamic sublane slice at
    small G (serving bucket-1 shapes, XL's G=2), but a (G, N) x (N, D)
    contraction is always legal and costs nothing at these sizes."""
    n = ref.shape[0]
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (g, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, n), 1)
    onehot = (rows == cols).astype(dtype)
    return jax.lax.dot_general(
        onehot, ref[...].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

def _block_body(
    x,        # (G, T, D) f32 residual stream
    a_g,      # (G, D) f32 activated conditioning rows for this group
    gain_msa, gain_mlp,  # traced scalars
    w_mod, w_qkv, w_out, w1, w2,  # materialized weight arrays (dtype)
    *,
    heads: int,
    inv_d: float,
    inv_h: float,
):
    """One whole DiT block on a VMEM-resident sample group — the shared
    compute body of `_kernel` (single block per pallas_call) and
    `_stack_kernel` (all ``depth`` blocks in one pallas_call)."""
    g, t, d = x.shape
    dtype = w_qkv.dtype
    skips = _skips()

    if "mod" in skips:  # ablation probe only (see _skips)
        shift_msa = shift_mlp = jnp.zeros((g, 1, d), jnp.float32)
        scale_msa = scale_mlp = gate_msa = gate_mlp = jnp.ones(
            (g, 1, d), jnp.float32
        )
    else:
        # ---- modulation head: (G, D) @ (6D, D)^T / sqrt(D) -> 6 chunks ---- #
        mods = jax.lax.dot_general(
            a_g.astype(dtype),
            w_mod,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d  # (G, 6D)

        def chunk(i):
            return mods[:, i * d : (i + 1) * d].reshape(g, 1, d)

        shift_msa, scale_msa, gate_msa = chunk(0), chunk(1), chunk(2)
        shift_mlp, scale_mlp, gate_mlp = chunk(3), chunk(4), chunk(5)

    # ---- attention branch (transpose-free: static head loop, per-head
    # G-batched 64x64 contractions — head slices are contiguous lane
    # ranges, so no relayout ever materializes) ---- #
    if "attn" not in skips:
        h_in = _modulate(x, shift_msa, scale_msa, gain_msa)
        qkv = jax.lax.dot_general(
            h_in.reshape(g * t, d).astype(dtype),
            w_qkv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d  # (G*T, 3D)

        # cosine attention: q/k rows normalized to norm sqrt(hd); with the
        # 1/sqrt(hd) SDPA scale the logits are sqrt(hd)-scaled cosines
        if "attn-core" in skips:  # ablation probe only
            attn = qkv[:, :d]
        else:
            attn = _attention_core(qkv, g, t, d, heads, dtype)
        out = jax.lax.dot_general(
            attn.astype(dtype),
            w_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d
        out = out.reshape(g, t, d)
        branch = gate_msa * out
        x = (x + (branch - x) * _RES_T) / _RES_DENOM  # mp_sum(x, gated, 0.3)

    # ---- MLP branch ---- #
    if "mlp" not in skips:
        h_in = _modulate(x, shift_mlp, scale_mlp, gain_mlp)
        h1 = jax.lax.dot_general(
            h_in.reshape(g * t, d).astype(dtype),
            w1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d
        h1 = (jax.nn.silu(h1) / _SILU_DIV).astype(dtype)
        h2 = jax.lax.dot_general(
            h1,
            w2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_h
        branch = gate_mlp * h2.reshape(g, t, d)
        x = (x + (branch - x) * _RES_T) / _RES_DENOM

    return x


def _kernel(
    gains_ref,  # SMEM (1, 2): gain_msa, gain_mlp
    x_ref,      # (G, T, D)
    a_ref,      # (N, D) full array, program_id-sliced — a (G, D) block
    #             violates Mosaic's 8-row divisibility when G < 8 (small
    #             serving buckets, XL VMEM pressure)
    wmod_ref,   # (6D, D)
    wqkv_ref,   # (3D, D)
    wout_ref,   # (D, D)
    w1_ref,     # (H, D)
    w2_ref,     # (D, H)
    o_ref,      # (G, T, D)
    *,
    group: int,
    heads: int,
    inv_d: float,
    inv_h: float,
):
    g, t, d = x_ref.shape
    dtype = wqkv_ref.dtype
    row0 = pl.program_id(0) * group

    x = x_ref[...].astype(jnp.float32)  # (G, T, D)
    a_g = _row_select(a_ref, row0, group, dtype)  # (G, D)
    x = _block_body(
        x, a_g, gains_ref[0, 0], gains_ref[0, 1],
        wmod_ref[...], wqkv_ref[...], wout_ref[...], w1_ref[...], w2_ref[...],
        heads=heads, inv_d=inv_d, inv_h=inv_h,
    )
    o_ref[...] = x.astype(o_ref.dtype)


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _reference(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads):
    """Plain jnp implementation of the same math (VJP + parity oracle)."""
    from mapdit_tpu.ops.mp import mp_silu, mp_sum, normalize

    n, t, d = x.shape
    hd = d // heads
    mods = a @ w_mod.T / math.sqrt(d)
    sm, scm, gm, sl, scl, gl = [
        mods[:, i * d : (i + 1) * d] for i in range(6)
    ]
    gain_msa, gain_mlp = gains[0], gains[1]

    def modu(z, shift, scale, gain):
        zs = z * scale[:, None, :]
        denom = jax.lax.stop_gradient(jnp.sqrt((1.0 - gain) ** 2 + gain**2))
        return (zs + (shift[:, None, :] - zs) * gain) / denom

    h = modu(x, sm, scm, gain_msa)
    qkv = h @ w_qkv.T / math.sqrt(d)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(z):
        return z.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    q, k = normalize(q), normalize(k)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    attn = jnp.einsum("nhqk,nhkd->nhqd", jax.nn.softmax(logits, axis=-1), v)
    attn = attn.transpose(0, 2, 1, 3).reshape(n, t, d)
    out = attn @ w_out.T / math.sqrt(d)
    x = mp_sum(x, gm[:, None, :] * out, t=_RES_T)

    h = modu(x, sl, scl, gain_mlp)
    y = mp_silu(h @ w1.T / math.sqrt(d)) @ w2.T / math.sqrt(w1.shape[0])
    return mp_sum(x, gl[:, None, :] * y, t=_RES_T)


def _fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads):
    n, t, d = x.shape
    h_mlp = w1.shape[0]
    # Group sizing: prefer >= 256 rows for MXU fill, but cap by a VMEM
    # budget so T=256 shapes (input-size 32) don't blow the ~16 MB scoped
    # limit: all weights stay resident + ~24*D bytes per activation row +
    # 8*T per row of live logits/probs tiles. Calibrated to keep the
    # measured S/T=64 g=8 configuration (516 steps/s, BENCH_NOTES r03).
    weight_bytes = ((6 + 3 + 1) * d * d + 2 * d * h_mlp) * x.dtype.itemsize
    budget_rows = max(t, ((_vmem_mb() - 3) * 2**20 - weight_bytes) // (24 * d + 8 * t))
    g = 1
    for want_fill in (True, False):
        for cand in (8, 4, 2):
            if (n % cand == 0 and cand * t <= budget_rows
                    and (cand * t >= 256 or not want_fill)):
                g = cand
                break
        else:
            continue
        break
    # experiment-only override: force a group size, bypassing the budget
    # (A/B probes of VMEM-pressure corners; not a production knob)
    force = os.environ.get("MAPDIT_MEGA_FORCE_GROUP")
    if force:
        f = int(force)
        if n % f == 0:
            g = f
        elif n >= f:
            # a real batch that cannot take the forced group is a probe
            # mistake — fail loudly rather than silently measuring auto-g
            raise ValueError(f"MAPDIT_MEGA_FORCE_GROUP={f} does not divide n={n}")
        # else: the n < f case is the model-init trace (n=1); auto-g applies

    return pl.pallas_call(
        functools.partial(
            _kernel,
            group=g,
            heads=heads,
            inv_d=1.0 / math.sqrt(d),
            inv_h=1.0 / math.sqrt(h_mlp),
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # full (N, D), program_id-sliced in-kernel (see kernel doc)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_mlp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h_mlp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            # modulation head is per-sample (no t factor); qkv/out/fc1/fc2
            # are per-token; attention is 2 batched T x T x hd matmuls
            flops=2 * n * d * 6 * d
            + 2 * n * t * d * (3 * d + d + 2 * h_mlp)
            + 4 * n * heads * t * t * (d // heads),
            bytes_accessed=(2 * n * t * d + (6 + 3 + 1) * d * d + 2 * d * h_mlp) * 2,
            transcendentals=n * t * h_mlp + n * heads * t * t,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(gains.reshape(1, 2).astype(jnp.float32), x, a, w_mod, w_qkv, w_out, w1, w2)


def _attn_kernel(
    gain_ref,   # SMEM (1, 1): gain_msa
    x_ref,      # (G, T, D)
    shift_ref,  # (N, D) full array — sliced by program_id (a (G, D) block
    scale_ref,  # (N, D)   would violate Mosaic's 8-row divisibility when
    gate_ref,   # (N, D)   VMEM pressure forces G < 8, e.g. XL's G=2)
    wqkv_ref,   # (3D, D)
    wout_ref,   # (D, D)
    o_ref,      # (G, T, D)
    *,
    group: int,
    heads: int,
    inv_d: float,
):
    """Attention half-block: modulate + qkv + cosine attention + out-proj +
    gated MP residual in one VMEM residency. The B-scale variant of the
    whole-block kernel — its weights are 4D^2 (4.7 MB bf16 at D=768) where
    the full block's 10D^2 + 8D^2 would blow VMEM; the modulation head and
    the MLP stay on the XLA pipeline."""
    g, t, d = x_ref.shape
    hd = d // heads
    dtype = wqkv_ref.dtype
    row0 = pl.program_id(0) * group

    x = x_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gate = _row_select(gate_ref, row0, group, dtype).reshape(g, 1, d)
    gain = gain_ref[0, 0]

    h_in = _modulate(x, shift, scale, gain)
    qkv = jax.lax.dot_general(
        h_in.reshape(g * t, d).astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d

    attn = _attention_core(qkv, g, t, d, heads, dtype)
    out = jax.lax.dot_general(
        attn.astype(dtype), wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d
    branch = gate * out.reshape(g, t, d)
    o_ref[...] = ((x + (branch - x) * _RES_T) / _RES_DENOM).astype(o_ref.dtype)


def _attn_bwd_math(gain, dy, x, shift, scale, gate, wqkv_ref, wout_ref,
                   heads: int, inv_d: float):
    """Shared math body of the attention half-block backward.

    Recomputes the forward from the raw inputs (flash-attention-style — no
    saved intermediates ever touch HBM), then runs the hand-derived VJP:
    residual -> out-proj -> per-head softmax / cosine-normalize -> qkv GEMM
    -> modulate. Per-head work stays on contiguous lane slices, so the
    training step never materializes the (N, H, T, hd) relayout the XLA
    path pays in both directions.

    Gradient semantics match the reference exactly: the modulate denominator
    is constant w.r.t. gain (`src/utils.py:15-16` coerces the tensor to a
    float), while `normalize` (`src/utils.py:19-23`) gets the FULL quotient
    VJP — its denominator is a live autograd edge in the reference.

    Returns (dx, dshift_rows, dscale_rows, dgate_rows, dgain_contrib,
    h, dqkv, attn, dout) — the last four are the flat dW GEMM operands,
    consumed either by the caller (streaming variant) or by the in-kernel
    dW accumulation (`_attn_bwd_dw_kernel`).
    """
    g, t, d = x.shape
    hd = d // heads
    dtype = wqkv_ref.dtype
    sqrt_hd = math.sqrt(hd)
    denom_mod = jnp.sqrt((1.0 - gain) ** 2 + gain**2)

    # ---- forward recompute (identical math to _attn_kernel) ---- #
    u = x * scale
    h = (u + (shift - u) * gain) / denom_mod  # (G, T, D)
    qkv = jax.lax.dot_general(
        h.reshape(g * t, d).astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, 3D)

    heads_fwd = []  # per head: (q, k, v, rq, rk, qn, kn, p)
    head_outs = []
    for hi in range(heads):
        q = qkv[:, 0 * d + hi * hd : 0 * d + (hi + 1) * hd].reshape(g, t, hd)
        k = qkv[:, 1 * d + hi * hd : 1 * d + (hi + 1) * hd].reshape(g, t, hd)
        v = qkv[:, 2 * d + hi * hd : 2 * d + (hi + 1) * hd].reshape(g, t, hd)
        rq = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        rk = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True))
        qn = q * sqrt_hd / (rq + _NORM_EPS)
        kn = k * sqrt_hd / (rk + _NORM_EPS)
        logits = jax.lax.dot_general(
            qn.astype(dtype), kn.astype(dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / sqrt_hd)
        p = jax.nn.softmax(logits, axis=-1)
        heads_fwd.append((q, k, v, rq, rk, qn, kn, p))
        head_outs.append(
            jax.lax.dot_general(
                p.astype(dtype), v.astype(dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(head_outs, axis=-1).reshape(g * t, d)
    out = jax.lax.dot_general(
        attn.astype(dtype), wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, t, d) * inv_d

    # ---- backward ---- #
    # residual y = (x + (gate*out - x)*tres)/rd; tres, rd compile-time consts
    dx = dy * ((1.0 - _RES_T) / _RES_DENOM)
    db = dy * (_RES_T / _RES_DENOM)          # d(gate*out)
    dgate_rows = jnp.sum(db * out, axis=1)   # (G, D)
    dout = db * gate                         # (G, T, D)

    # out-proj: out = attn @ Wout^T * inv_d  =>  dattn = dout @ Wout * inv_d
    dattn = jax.lax.dot_general(
        dout.reshape(g * t, d).astype(dtype),
        wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, D)

    dq_cols, dk_cols, dv_cols = [], [], []
    for hi, (q, k, v, rq, rk, qn, kn, p) in enumerate(heads_fwd):
        do_h = dattn[:, hi * hd : (hi + 1) * hd].reshape(g, t, hd)
        # o = p @ v
        dp = jax.lax.dot_general(
            do_h.astype(dtype), v.astype(dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, T, T)
        dv = jax.lax.dot_general(
            p.astype(dtype), do_h.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, T, hd)
        # softmax
        dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dlog = dlog * (1.0 / sqrt_hd)
        dqn = jax.lax.dot_general(
            dlog.astype(dtype), kn.astype(dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkn = jax.lax.dot_general(
            dlog.astype(dtype), qn.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # normalize: zn = z*sqrt(hd)/(r+eps) — FULL quotient VJP (the
        # denominator is a live edge in the reference, unlike modulate's)
        def dnorm(z, r, dzn):
            c = sqrt_hd / (r + _NORM_EPS)
            zdot = jnp.sum(z * dzn, axis=-1, keepdims=True)
            return c * dzn - z * (zdot * sqrt_hd / (r * (r + _NORM_EPS) ** 2))

        dq_cols.append(dnorm(q, rq, dqn).reshape(g * t, hd))
        dk_cols.append(dnorm(k, rk, dkn).reshape(g * t, hd))
        dv_cols.append(dv.reshape(g * t, hd))
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)  # (G*T, 3D)

    # qkv = h @ Wqkv^T * inv_d  =>  dh = dqkv @ Wqkv * inv_d
    dh = jax.lax.dot_general(
        dqkv.astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, t, d) * inv_d

    # modulate h = (u*(1-gain) + shift*gain)/denom_mod, u = x*scale;
    # denom_mod is stop-gradient (reference coerces gain to float there)
    du = dh * ((1.0 - gain) / denom_mod)
    dshift_rows = jnp.sum(dh, axis=1) * (gain / denom_mod)       # (G, D)
    dgain_contrib = jnp.sum(dh * (shift - u)) / denom_mod
    dx = dx + du * scale
    dscale_rows = jnp.sum(du * x, axis=1)                        # (G, D)

    return (dx, dshift_rows, dscale_rows, dgate_rows, dgain_contrib,
            h, dqkv, attn, dout)


def _scatter_rows(rows_g, n, row0, g):
    """(G, D) group rows -> (N, D) via a one-hot contraction (legal at any
    G where a dynamic sublane store is not, see _row_select)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, g), 0)
    cols = row0 + jax.lax.broadcasted_iota(jnp.int32, (n, g), 1)
    onehot_t = (rows == cols).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot_t, rows_g,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attn_bwd_kernel(
    gain_ref,   # SMEM (1, 1): gain_msa
    dy_ref,     # (G, T, D) upstream cotangent
    x_ref,      # (G, T, D)
    shift_ref,  # (N, D) full, program_id-sliced (see _attn_kernel doc)
    scale_ref,  # (N, D)
    gate_ref,   # (N, D)
    wqkv_ref,   # (3D, D)
    wout_ref,   # (D, D)
    dx_ref,     # (G, T, D) out
    dshift_ref, # (N, D) f32 out, accumulated across the sequential grid
    dscale_ref, # (N, D) f32 out, accumulated
    dgate_ref,  # (N, D) f32 out, accumulated
    dgain_ref,  # SMEM (1, 1) f32 out, accumulated
    h_ref,      # (G, T, D) out: modulated input (operand of the dW_qkv GEMM)
    dqkv_ref,   # (G, T, 3D) out (operand of the dW_qkv GEMM)
    attn_ref,   # (G, T, D) out (operand of the dW_out GEMM)
    dout_ref,   # (G, T, D) out (operand of the dW_out GEMM)
    *,
    group: int,
    heads: int,
    inv_d: float,
):
    """Streaming variant (the default): weight gradients are NOT formed
    here — the four flat GEMM operands (h, dqkv, attn, dout) stream to HBM
    and the caller contracts them as two plain (X^T @ Y) XLA matmuls.
    Measured faster than the in-kernel-dW variant at every scale tried
    (see _DW_IN_KERNEL_BUDGET)."""
    g, t, d = x_ref.shape
    pid = pl.program_id(0)
    row0 = pid * group
    dtype = wqkv_ref.dtype

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gate = _row_select(gate_ref, row0, group, dtype).reshape(g, 1, d)

    (dx, dshift_rows, dscale_rows, dgate_rows, dgain_contrib,
     h, dqkv, attn, dout) = _attn_bwd_math(
        gain_ref[0, 0], dy, x, shift, scale, gate, wqkv_ref, wout_ref,
        heads, inv_d,
    )

    dx_ref[...] = dx.astype(dx_ref.dtype)
    h_ref[...] = h.astype(h_ref.dtype)
    dqkv_ref[...] = dqkv.reshape(g, t, 3 * d).astype(dqkv_ref.dtype)
    attn_ref[...] = attn.reshape(g, t, d).astype(attn_ref.dtype)
    dout_ref[...] = dout.astype(dout_ref.dtype)

    n = dshift_ref.shape[0]

    @pl.when(pid == 0)
    def _():
        dshift_ref[...] = _scatter_rows(dshift_rows, n, row0, g)
        dscale_ref[...] = _scatter_rows(dscale_rows, n, row0, g)
        dgate_ref[...] = _scatter_rows(dgate_rows, n, row0, g)
        dgain_ref[0, 0] = dgain_contrib

    @pl.when(pid > 0)
    def _():
        dshift_ref[...] += _scatter_rows(dshift_rows, n, row0, g)
        dscale_ref[...] += _scatter_rows(dscale_rows, n, row0, g)
        dgate_ref[...] += _scatter_rows(dgate_rows, n, row0, g)
        dgain_ref[0, 0] += dgain_contrib


def _attn_bwd_dw_kernel(
    gain_ref, dy_ref, x_ref, shift_ref, scale_ref, gate_ref,
    wqkv_ref, wout_ref,
    dx_ref, dshift_ref, dscale_ref, dgate_ref, dgain_ref,
    dwqkv_ref,  # (3D, D) f32 out, accumulated across the sequential grid
    dwout_ref,  # (D, D) f32 out, accumulated
    *,
    group: int,
    heads: int,
    inv_d: float,
):
    """In-kernel-dW variant (off by default — measured slower, see
    _DW_IN_KERNEL_BUDGET): the weight gradients accumulate in VMEM as
    per-grid-step (K = G*T)-deep MXU contractions, so the four flat GEMM
    operands never touch HBM. Requires 16D^2 bytes of f32 accumulator
    VMEM. Kept (with its parity test) as the re-test escape hatch."""
    g, t, d = x_ref.shape
    pid = pl.program_id(0)
    row0 = pid * group
    dtype = wqkv_ref.dtype

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gate = _row_select(gate_ref, row0, group, dtype).reshape(g, 1, d)

    (dx, dshift_rows, dscale_rows, dgate_rows, dgain_contrib,
     h, dqkv, attn, dout) = _attn_bwd_math(
        gain_ref[0, 0], dy, x, shift, scale, gate, wqkv_ref, wout_ref,
        heads, inv_d,
    )

    dx_ref[...] = dx.astype(dx_ref.dtype)

    # dW_qkv += dqkv^T @ h; dW_out += dout^T @ attn (raw — the caller
    # applies the shared inv_d scale once at the end)
    dwqkv_step = jax.lax.dot_general(
        dqkv.astype(dtype), h.reshape(g * t, d).astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwout_step = jax.lax.dot_general(
        dout.reshape(g * t, d).astype(dtype), attn.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    n = dshift_ref.shape[0]

    @pl.when(pid == 0)
    def _():
        dshift_ref[...] = _scatter_rows(dshift_rows, n, row0, g)
        dscale_ref[...] = _scatter_rows(dscale_rows, n, row0, g)
        dgate_ref[...] = _scatter_rows(dgate_rows, n, row0, g)
        dgain_ref[0, 0] = dgain_contrib
        dwqkv_ref[...] = dwqkv_step
        dwout_ref[...] = dwout_step

    @pl.when(pid > 0)
    def _():
        dshift_ref[...] += _scatter_rows(dshift_rows, n, row0, g)
        dscale_ref[...] += _scatter_rows(dscale_rows, n, row0, g)
        dgate_ref[...] += _scatter_rows(dgate_rows, n, row0, g)
        dgain_ref[0, 0] += dgain_contrib
        dwqkv_ref[...] += dwqkv_step
        dwout_ref[...] += dwout_step


# f32 dW accumulators (16D^2 bytes) must fit VMEM next to the bf16 weights
# and activation tiles for the in-kernel variant. Chip A/B (r03, S/2 b256
# resident-data train): in-kernel dW measured 27.6 steps/s vs streaming's
# 29.4 — the per-grid-step (K=G*T)-deep dW contractions sequentialize MXU
# work that XLA's single K=N*T GEMM does better — so streaming is the
# default everywhere; raise this budget to re-test the in-kernel variant.
_DW_IN_KERNEL_BUDGET = 0


def _attn_bwd_impl(dy, x, shift, scale, gate, gain, w_qkv, w_out, heads):
    n, t, d = x.shape
    dw_bytes = 16 * d * d
    dw_in_kernel = dw_bytes <= _DW_IN_KERNEL_BUDGET
    # VMEM-aware group: ~13 f32 row-width activations (x, dy, dx, h, u,
    # qkv+dqkv as 3-wide each, dh, attn, dout) + per-head (T, T) logits
    # tiles + the bf16 weights (+ f32 dW accumulators for the in-kernel
    # variant) must fit next to double-buffering headroom. The 10 MB scoped
    # budget is calibrated on chip: 13 MB put B's streaming g=2 440K over
    # Mosaic's 16 MB scoped-VMEM limit (r03 A/B).
    weight_bytes = 4 * d * d * x.dtype.itemsize
    fixed_bytes = weight_bytes + (dw_bytes if dw_in_kernel else 0)
    budget_rows = max(t, (10 * 2**20 - fixed_bytes) // (80 * d))
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    out_dtype = w_qkv.dtype
    blocked = lambda width=1: pl.BlockSpec(
        (g, t, width * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    common_out_specs = (
        blocked(),                  # dx
        full(n, d),                 # dshift (accumulated)
        full(n, d),                 # dscale
        full(n, d),                 # dgate
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )
    common_out_shape = (
        jax.ShapeDtypeStruct((n, t, d), x.dtype),
        jax.ShapeDtypeStruct((n, d), jnp.float32),
        jax.ShapeDtypeStruct((n, d), jnp.float32),
        jax.ShapeDtypeStruct((n, d), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    if dw_in_kernel:
        kernel = _attn_bwd_dw_kernel
        out_specs = common_out_specs + (full(3 * d, d), full(d, d))
        out_shape = common_out_shape + (
            jax.ShapeDtypeStruct((3 * d, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
        )
        extra_bytes = 16 * d * d
    else:
        kernel = _attn_bwd_kernel
        out_specs = common_out_specs + (blocked(), blocked(3), blocked(), blocked())
        out_shape = common_out_shape + (
            jax.ShapeDtypeStruct((n, t, d), out_dtype),
            jax.ShapeDtypeStruct((n, t, 3 * d), out_dtype),
            jax.ShapeDtypeStruct((n, t, d), out_dtype),
            jax.ShapeDtypeStruct((n, t, d), out_dtype),
        )
        extra_bytes = 6 * n * t * d * 2
    return pl.pallas_call(
        functools.partial(kernel, group=g, heads=heads, inv_d=1.0 / math.sqrt(d)),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blocked(),  # dy
            blocked(),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (N, D) full
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            # forward recompute + activation backward (+ dW contractions
            # when in-kernel): ~3-4x the forward GEMMs
            flops=(4 if dw_in_kernel else 3)
            * (2 * n * t * d * 4 * d + 4 * n * heads * t * t * (d // heads)),
            bytes_accessed=(2 + 2) * n * t * d * 4 + 4 * d * d * 4 + extra_bytes,
            transcendentals=2 * n * heads * t * t,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(gain, jnp.float32).reshape(1, 1),
        dy, x, shift, scale, gate, w_qkv, w_out,
    )


def _attn_bwd(dy, x, shift, scale, gate, gain, w_qkv, w_out, heads):
    """Full backward: the Pallas kernel + (streaming variant only) the two
    flat dW GEMMs. Returns the seven cotangents in input order."""
    n, t, d = x.shape
    inv_d = 1.0 / math.sqrt(d)
    outs = _attn_bwd_impl(dy, x, shift, scale, gate, gain, w_qkv, w_out, heads)
    dx, dshift, dscale, dgate, dgain = outs[:5]
    if len(outs) == 7:  # in-kernel dW (raw accumulators, shared inv_d scale)
        dw_qkv = outs[5] * inv_d
        dw_out = outs[6] * inv_d
    else:
        h, dqkv, attn, dout = outs[5:]
        dw_qkv = jax.lax.dot_general(
            dqkv.reshape(n * t, 3 * d), h.reshape(n * t, d),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d
        dw_out = jax.lax.dot_general(
            dout.reshape(n * t, d), attn.reshape(n * t, d),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_d
    return dx, dshift, dscale, dgate, dgain, dw_qkv, dw_out


def _attn_reference(x, shift, scale, gate, gain, w_qkv, w_out, heads):
    from mapdit_tpu.ops.mp import mp_sum, normalize

    n, t, d = x.shape
    hd = d // heads

    zs = x * scale[:, None, :]
    denom = jax.lax.stop_gradient(jnp.sqrt((1.0 - gain) ** 2 + gain**2))
    h = (zs + (shift[:, None, :] - zs) * gain) / denom
    qkv = h @ w_qkv.T / math.sqrt(d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    th = lambda z: z.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    q, k, v = th(q), th(k), th(v)
    q, k = normalize(q), normalize(k)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    attn = jnp.einsum("nhqk,nhkd->nhqd", jax.nn.softmax(logits, axis=-1), v)
    attn = attn.transpose(0, 2, 1, 3).reshape(n, t, d)
    out = attn @ w_out.T / math.sqrt(d)
    return mp_sum(x, gate[:, None, :] * out, t=_RES_T)


def _attn_fwd_impl(x, shift, scale, gate, gain, w_qkv, w_out, heads):
    n, t, d = x.shape
    # VMEM-aware group size: weights (4D^2) + ~24*d bytes per activation row
    # (qkv f32 + x in/out + attn) must stay under ~15 MB; prefer >=256 rows
    # for MXU fill, shrink when big-D weights crowd the budget (XL: g=2).
    weight_bytes = 4 * d * d * x.dtype.itemsize
    budget_rows = max(t, ((_vmem_mb() - 1) * 2**20 - weight_bytes) // (24 * d))
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    return pl.pallas_call(
        functools.partial(
            _attn_kernel, group=g, heads=heads, inv_d=1.0 / math.sqrt(d)
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # full (N, D) arrays, program_id-sliced in-kernel (see kernel doc)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * d * (3 * d + d)
            + 4 * n * heads * t * t * (d // heads),
            bytes_accessed=(2 * n * t * d + 4 * d * d) * 2,
            transcendentals=n * heads * t * t,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(
        jnp.asarray(gain, jnp.float32).reshape(1, 1),
        x, shift, scale, gate, w_qkv, w_out,
    )


def _attn_res_kernel(
    gain_ref,   # SMEM (1, 1): gain_msa
    x_ref,      # (G, T, D)
    shift_ref,  # (N, D) full, program_id-sliced (see _attn_kernel doc)
    scale_ref,  # (N, D)
    gate_ref,   # (N, D)
    wqkv_ref,   # (3D, D)
    wout_ref,   # (D, D)
    o_ref,      # (G, T, D) out: the half-block result
    p_ref,      # (G, heads, T, T) f32 out: softmax probabilities (residual)
    attn_ref,   # (G, T, D) out: pre-out-proj attention (residual)
    *,
    group: int,
    heads: int,
    inv_d: float,
):
    """Residual-emitting variant of `_attn_kernel` (training forward for
    ``attn_bwd="residual"``): identical math, but the per-head softmax
    probabilities and the pre-projection attention stream to HBM so the
    backward can run as plain XLA GEMMs with NO forward recompute — neither
    the flash-style in-kernel recompute of `_attn_bwd_kernel` nor the full
    jnp recompute of the "reference" VJP. f32 probabilities on purpose:
    bf16 p would put ~1e-3 relative error on the softmax VJP, past the
    5e-4 gradient parity tolerance."""
    g, t, d = x_ref.shape
    hd = d // heads
    dtype = wqkv_ref.dtype
    row0 = pl.program_id(0) * group

    x = x_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gate = _row_select(gate_ref, row0, group, dtype).reshape(g, 1, d)
    gain = gain_ref[0, 0]

    h_in = _modulate(x, shift, scale, gain)
    qkv = jax.lax.dot_general(
        h_in.reshape(g * t, d).astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, 3D)

    gemm_reduce = _gemm_reduce_pays(g * t, d)
    scales = _cosine_scales(qkv, d, heads, hd) if gemm_reduce else None
    head_outs = []
    for hi in range(heads):
        q = qkv[:, 0 * d + hi * hd : 0 * d + (hi + 1) * hd].reshape(g, t, hd)
        k = qkv[:, 1 * d + hi * hd : 1 * d + (hi + 1) * hd].reshape(g, t, hd)
        v = qkv[:, 2 * d + hi * hd : 2 * d + (hi + 1) * hd].reshape(g, t, hd)
        if scales is None:
            # small-M fallback (see _attention_core): pre-GEMM normalize
            q = q * (math.sqrt(hd) / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + _NORM_EPS))
            k = k * (math.sqrt(hd) / (jnp.sqrt(jnp.sum(k * k, -1, keepdims=True)) + _NORM_EPS))
        logits = jax.lax.dot_general(
            q.astype(dtype),
            k.astype(dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / math.sqrt(hd))
        if scales is not None:
            # logits-fold cosine normalize (see _attention_core)
            qs = scales[:, hi].reshape(g, t)
            ks = scales[:, heads + hi].reshape(g, t)
            logits = logits * qs[:, :, None] * ks[:, None, :]
        # max-free softmax (cosine logits provably bounded by sqrt(hd))
        ex = jnp.exp(logits - math.sqrt(hd))
        if gemm_reduce:
            denom = jax.lax.dot_general(
                ex,
                jnp.ones((t, 1), jnp.float32),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            denom = jnp.sum(ex, axis=-1, keepdims=True)
        p = ex * (1.0 / denom)  # materialized: it IS the residual
        p_ref[:, hi] = p.astype(p_ref.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p.astype(dtype),
                v.astype(dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(head_outs, axis=-1).reshape(g * t, d)
    attn_ref[...] = attn.reshape(g, t, d).astype(attn_ref.dtype)

    out = jax.lax.dot_general(
        attn.astype(dtype), wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d
    branch = gate * out.reshape(g, t, d)
    o_ref[...] = ((x + (branch - x) * _RES_T) / _RES_DENOM).astype(o_ref.dtype)


def _attn_res_fwd_impl(x, shift, scale, gate, gain, w_qkv, w_out, heads):
    n, t, d = x.shape
    # VMEM-aware group: the `_attn_fwd_impl` budget plus the residual output
    # blocks — p is (G, heads, T, T) f32 (4*heads*T bytes per activation row)
    # and attn (G, T, D) adds one more weight-dtype row width.
    weight_bytes = 4 * d * d * x.dtype.itemsize
    budget_rows = max(
        t,
        ((_vmem_mb() - 1) * 2**20 - weight_bytes) // (26 * d + 4 * heads * t),
    )
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    return pl.pallas_call(
        functools.partial(
            _attn_res_kernel, group=g, heads=heads, inv_d=1.0 / math.sqrt(d)
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (g, heads, t, t), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, d), x.dtype),
            jax.ShapeDtypeStruct((n, heads, t, t), jnp.float32),
            jax.ShapeDtypeStruct((n, t, d), w_qkv.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * d * (3 * d + d)
            + 4 * n * heads * t * t * (d // heads),
            bytes_accessed=(2 * n * t * d + 4 * d * d) * 2
            + 4 * n * heads * t * t,
            transcendentals=n * heads * t * t,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(
        jnp.asarray(gain, jnp.float32).reshape(1, 1),
        x, shift, scale, gate, w_qkv, w_out,
    )


def _attn_bwd_from_res(dy, x, shift, scale, gate, gain, w_qkv, w_out,
                       p, attn, heads: int):
    """Backward for ``attn_bwd="residual"``: plain XLA ops consuming the
    kernel-saved residuals (softmax probabilities ``p``, pre-projection
    ``attn``). Nothing expensive is recomputed — only the elementwise
    modulate, one qkv GEMM (bit-identical to the kernel's: same operands,
    same bf16->f32 contraction), the q/k norms, and the out-projection.
    Gradient semantics match `_attn_bwd_math` / the reference exactly:
    modulate's denominator is constant w.r.t. gain, normalize gets the full
    quotient VJP."""
    n, t, d = x.shape
    hd = d // heads
    dtype = w_qkv.dtype
    inv_d = 1.0 / math.sqrt(d)
    sqrt_hd = math.sqrt(hd)
    x = x.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    shift_b = shift.astype(jnp.float32)[:, None, :]
    scale_b = scale.astype(jnp.float32)[:, None, :]
    gate_b = gate.astype(jnp.float32)[:, None, :]
    denom_mod = jnp.sqrt((1.0 - gain) ** 2 + gain**2)

    # ---- cheap forward re-derivations ---- #
    u = x * scale_b
    h = (u + (shift_b - u) * gain) / denom_mod  # (N, T, D)
    qkv = jax.lax.dot_general(
        h.reshape(n * t, d).astype(dtype), w_qkv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d
    to_heads = lambda z: z.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    q = to_heads(qkv[:, :d].reshape(n, t, d))
    k = to_heads(qkv[:, d : 2 * d].reshape(n, t, d))
    v = to_heads(qkv[:, 2 * d :].reshape(n, t, d))
    rq = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    rk = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True))
    qn = q * (sqrt_hd / (rq + _NORM_EPS))
    kn = k * (sqrt_hd / (rk + _NORM_EPS))
    out = jax.lax.dot_general(
        attn.reshape(n * t, d).astype(dtype), w_out,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, t, d) * inv_d

    # ---- backward ---- #
    dx = dy * ((1.0 - _RES_T) / _RES_DENOM)
    db = dy * (_RES_T / _RES_DENOM)
    dgate = jnp.sum(db * out, axis=1)
    dout = db * gate_b

    dattn = jax.lax.dot_general(
        dout.reshape(n * t, d).astype(dtype), w_out,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d
    dw_out = jax.lax.dot_general(
        dout.reshape(n * t, d), attn.reshape(n * t, d).astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d

    do = to_heads(dattn.reshape(n, t, d))  # (N, H, T, hd)
    p = p.astype(jnp.float32)
    dp = jax.lax.dot_general(
        do.astype(dtype), v.astype(dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (N, H, T, T)
    dv = jax.lax.dot_general(
        p.astype(dtype), do.astype(dtype),
        dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (N, H, T, hd)
    dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dlog = dlog * (1.0 / sqrt_hd)
    dqn = jax.lax.dot_general(
        dlog.astype(dtype), kn.astype(dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    dkn = jax.lax.dot_general(
        dlog.astype(dtype), qn.astype(dtype),
        dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )

    def dnorm(z, r, dzn):
        c = sqrt_hd / (r + _NORM_EPS)
        zdot = jnp.sum(z * dzn, axis=-1, keepdims=True)
        return c * dzn - z * (zdot * sqrt_hd / (r * (r + _NORM_EPS) ** 2))

    from_heads = lambda z: z.transpose(0, 2, 1, 3).reshape(n * t, d)
    dqkv = jnp.concatenate(
        [from_heads(dnorm(q, rq, dqn)), from_heads(dnorm(k, rk, dkn)),
         from_heads(dv)],
        axis=-1,
    )  # (N*T, 3D)

    dh = jax.lax.dot_general(
        dqkv.astype(dtype), w_qkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, t, d) * inv_d
    dw_qkv = jax.lax.dot_general(
        dqkv, h.reshape(n * t, d),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d

    du = dh * ((1.0 - gain) / denom_mod)
    dshift = jnp.sum(dh, axis=1) * (gain / denom_mod)
    dgain = jnp.sum(dh * (shift_b - u)) / denom_mod
    dx = dx + du * scale_b
    dscale = jnp.sum(du * x, axis=1)

    return dx, dshift, dscale, dgate, dgain, dw_qkv, dw_out


@functools.lru_cache(maxsize=None)
def _make_attn(heads: int, bwd_impl: str = "pallas"):
    @jax.custom_vjp
    def f(x, shift, scale, gate, gain, w_qkv, w_out):
        return _attn_fwd_impl(x, shift, scale, gate, gain, w_qkv, w_out, heads)

    def fwd(x, shift, scale, gate, gain, w_qkv, w_out):
        return (
            _attn_fwd_impl(x, shift, scale, gate, gain, w_qkv, w_out, heads),
            (x, shift, scale, gate, gain, w_qkv, w_out),
        )

    def fwd_residual(x, shift, scale, gate, gain, w_qkv, w_out):
        y, p, attn = _attn_res_fwd_impl(
            x, shift, scale, gate, gain, w_qkv, w_out, heads
        )
        return y, (x, shift, scale, gate, gain, w_qkv, w_out, p, attn)

    def bwd_residual(res, dy):
        x, shift, scale, gate, gain, w_qkv, w_out, p, attn = res
        dx, dshift, dscale, dgate, dgain, dw_qkv, dw_out = _attn_bwd_from_res(
            dy, x, shift, scale, gate, gain, w_qkv, w_out, p, attn, heads
        )
        gain_dtype = jnp.result_type(gain)
        return (
            dx.astype(x.dtype),
            dshift.astype(shift.dtype),
            dscale.astype(scale.dtype),
            dgate.astype(gate.dtype),
            dgain.reshape(jnp.shape(gain)).astype(gain_dtype),
            dw_qkv.astype(w_qkv.dtype),
            dw_out.astype(w_out.dtype),
        )

    def bwd_reference(res, g):
        # recompute through the plain jnp path — XLA differentiates it
        # (adds a full forward recompute on top of training's own forward)
        _, vjp = jax.vjp(lambda *args: _attn_reference(*args, heads), *res)
        return vjp(g)

    def bwd_pallas(res, dy):
        # hand-written fused backward (see _attn_bwd_math): one kernel for
        # every activation/modulation grad; dW in-kernel (S-class D) or as
        # two flat XLA GEMMs over streamed operands (B/XL)
        x, shift, scale, gate, gain, w_qkv, w_out = res
        dx, dshift, dscale, dgate, dgain, dw_qkv, dw_out = _attn_bwd(
            dy, x, shift, scale, gate, gain, w_qkv, w_out, heads
        )
        gain_dtype = jnp.result_type(gain)
        return (
            dx.astype(x.dtype),
            dshift.astype(shift.dtype),
            dscale.astype(scale.dtype),
            dgate.astype(gate.dtype),
            dgain.reshape(jnp.shape(gain)).astype(gain_dtype),
            dw_qkv.astype(w_qkv.dtype),
            dw_out.astype(w_out.dtype),
        )

    if bwd_impl == "residual":
        f.defvjp(fwd_residual, bwd_residual)
    else:
        f.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_reference)
    return f


def fused_attn_branch(
    x, shift, scale, gate, gain, w_qkv, w_out, heads: int, bwd: str = "pallas"
):
    """Attention half-block in one Pallas kernel (see _attn_kernel).

    ``bwd`` picks the VJP: "pallas" (default) runs the fused backward kernel
    — flash-style forward recompute + hand VJP in one Pallas residency;
    "residual" runs the residual-emitting forward kernel (`_attn_res_kernel`)
    and a pure-XLA backward over the saved softmax/attention residuals (no
    forward recompute anywhere); "reference" recomputes through the plain
    jnp ops (the r02 inference-only behavior, kept for A/B and as an escape
    hatch). Inference (no grad) always runs the residual-free forward."""
    return _make_attn(heads, bwd)(x, shift, scale, gate, gain, w_qkv, w_out)


# ---------------------------------------------------------------------------
# Tensor-parallel attention half-block: the head-sharded shard_map island.
#
# GSPMD has no partitioning rule for the megakernel custom-calls, so the TP
# latency layout (build_sample_fn(mesh=) with a nontrivial 'model' axis) used
# to fall back to the XLA pipeline (VERDICT r03 weak #2). The fix: every
# model shard runs THIS kernel on its LOCAL contiguous block of heads —
# modulate (full D, replicated math) + local-qkv GEMM + cosine attention over
# heads_local + the PARTIAL out-projection — and one psum over the 'model'
# axis assembles the branch output. The gated MP residual is linear in the
# branch, so it applies replicated after the psum. Reference math unchanged:
# `src/layers/attention.py:9-51` sliced at head granularity (cosine
# normalization is per-head, so the split is exact, not approximate).
# ---------------------------------------------------------------------------


def _attn_tp_kernel(
    gain_ref,   # SMEM (1, 1): gain_msa
    x_ref,      # (G, T, D) residual stream (full channels, replicated)
    shift_ref,  # (N, D) full, program_id-sliced (see _attn_kernel doc)
    scale_ref,  # (N, D)
    wqkv_ref,   # (3*Dl, D) LOCAL head rows: [q_local; k_local; v_local]
    wout_ref,   # (D, Dl) LOCAL in-columns of the out-projection
    o_ref,      # (G, T, D) f32 out: PARTIAL pre-gate out-projection
    *,
    group: int,
    heads_local: int,
    inv_d: float,
):
    """Head-shard variant of `_attn_kernel`: same modulate/qkv/attention
    math on a contiguous slice of heads, emitting the partial out-projection
    (f32 — the cross-shard psum accumulates partials, bf16 partials would
    put ~1e-3 relative error on the branch) with NO gate/residual epilogue;
    the caller psums partials over the model axis and applies the linear
    gated-MP-residual epilogue replicated."""
    g, t, d = x_ref.shape
    d_l = wqkv_ref.shape[0] // 3
    dtype = wqkv_ref.dtype
    row0 = pl.program_id(0) * group

    x = x_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gain = gain_ref[0, 0]

    h_in = _modulate(x, shift, scale, gain)
    qkv = jax.lax.dot_general(
        h_in.reshape(g * t, d).astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, 3*Dl)

    attn = _attention_core(qkv, g, t, d_l, heads_local, dtype)
    out = jax.lax.dot_general(
        attn.astype(dtype), wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, D) partial
    o_ref[...] = out.reshape(g, t, d)


def _attn_tp_partial_impl(x, shift, scale, gain, w_qkv_l, w_out_l, heads_local):
    n, t, d = x.shape
    d_l = w_qkv_l.shape[0] // 3
    # VMEM-aware group size (same budget model as _attn_fwd_impl, with the
    # per-shard 4*D*Dl weight footprint)
    weight_bytes = 4 * d * d_l * x.dtype.itemsize
    budget_rows = max(t, ((_vmem_mb() - 1) * 2**20 - weight_bytes) // (24 * d))
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    return pl.pallas_call(
        functools.partial(
            _attn_tp_kernel, group=g, heads_local=heads_local,
            inv_d=1.0 / math.sqrt(d),
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d_l, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * d * (3 * d_l + d_l)
            + 4 * n * heads_local * t * t * (d_l // heads_local),
            bytes_accessed=(2 * n * t * d + 4 * d * d_l) * 2 + 2 * n * t * d,
            transcendentals=n * heads_local * t * t,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(
        jnp.asarray(gain, jnp.float32).reshape(1, 1),
        x, shift, scale, w_qkv_l, w_out_l,
    )


def _attn_tp_partial_reference(x, shift, scale, gain, w_qkv_l, w_out_l,
                               heads_local):
    """jnp oracle for the per-shard partial (parity tests)."""
    from mapdit_tpu.ops.mp import normalize

    n, t, d = x.shape
    d_l = w_qkv_l.shape[0] // 3
    hd = d_l // heads_local

    zs = x * scale[:, None, :]
    denom = jnp.sqrt((1.0 - gain) ** 2 + gain**2)
    h = (zs + (shift[:, None, :] - zs) * gain) / denom
    qkv = h @ w_qkv_l.T / math.sqrt(d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    th = lambda z: z.reshape(n, t, heads_local, hd).transpose(0, 2, 1, 3)
    q, k, v = th(q), th(k), th(v)
    q, k = normalize(q), normalize(k)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    attn = jnp.einsum("nhqk,nhkd->nhqd", jax.nn.softmax(logits, axis=-1), v)
    attn = attn.transpose(0, 2, 1, 3).reshape(n, t, d_l)
    return (attn @ w_out_l.T / math.sqrt(d)).astype(jnp.float32)


def fused_attn_branch_tp(
    x, shift, scale, gate, gain, w_qkv3, w_out_l, *,
    heads_local: int, axis_name: str,
):
    """Tensor-parallel attention half-block for a shard_map body.

    ``w_qkv3``: (3, Dl, D) — the LOCAL head-rows of the qkv weight, stacked
    q/k/v so a model-axis split of the middle dim is head-contiguous per
    projection (a flat (3D, D) model-split would hand shard 0 a slice of q
    only). ``w_out_l``: (D, Dl) local in-columns. Inference-only (the TP
    latency layout runs folded weights; training under TP keeps the XLA
    pipeline). Returns the updated residual stream, replicated over the
    model axis."""
    three, d_l, d = w_qkv3.shape
    assert three == 3, w_qkv3.shape
    partial = _attn_tp_partial_impl(
        x, shift, scale, gain, w_qkv3.reshape(3 * d_l, d), w_out_l,
        heads_local,
    )
    out = jax.lax.psum(partial, axis_name)
    branch = gate[:, None, :].astype(jnp.float32) * out
    xf = x.astype(jnp.float32)
    return ((xf + (branch - xf) * _RES_T) / _RES_DENOM).astype(x.dtype)


# ---------------------------------------------------------------------------
# Tensor-parallel FULL block: modulation head + attention + MLP all inside
# the shard_map island (VERDICT r04 #1 — "finish the block").
#
# mega_attn_tp islanded only the attention half; the MLP half and the
# modulation head stayed on GSPMD, paying exactly the relayout/normalize
# HBM traffic the single-chip megakernel exists to remove. The full-block
# recipe ("mega_tp"):
#
#   kernel 1 (per shard): modulation-head GEMM (REPLICATED math — the
#     (6D, D) weight is tiny and shift/scale are consumed full-D by every
#     shard, so replicating beats a column-split + all-gather) + the
#     head-sharded attention partial (same math as _attn_tp_kernel). Two
#     outputs: the f32 partial out-projection and the f32 (G, 6, D)
#     modulation chunks.
#   psum #1 over 'model' -> replicated gated-MP attention residual.
#   kernel 2 (per shard): MLP partial — modulate prologue + column-split
#     fc1 rows (MP-SiLU is elementwise on local hidden lanes, so the split
#     is exact) + row-split fc2 -> f32 partial.
#   psum #2 -> replicated gated-MP MLP residual.
#
# Two psums are the GSPMD-TP minimum for this dependency chain (the MLP
# input needs the completed attention residual); the win over GSPMD is that
# every GEMM + modulate + normalize runs inside Pallas with no head
# relayout and no standalone elementwise HBM passes. Reference math:
# `src/blocks/dit_block.py:10-37`, `src/layers/mlp.py:7-25`,
# `src/layers/attention.py:9-51`. Inference-only, like the other islands.
# ---------------------------------------------------------------------------


def _block_tp_kernel(
    gains_ref,  # SMEM (1, 2): gain_msa, gain_mlp (gain_mlp consumed by
    #             kernel 2; one array so the caller stacks gains once)
    x_ref,      # (G, T, D) residual stream (full channels, replicated)
    a_ref,      # (N, D) activated conditioning, full, program_id-sliced
    wmod_ref,   # (6D, D) modulation head weight, REPLICATED
    wqkv_ref,   # (3*Dl, D) LOCAL head rows
    wout_ref,   # (D, Dl) LOCAL in-columns of the out-projection
    o_ref,      # (G, T, D) f32 out: PARTIAL pre-gate out-projection
    mods_ref,   # (G, 6, D) f32 out: modulation chunks (replicated math)
    *,
    group: int,
    heads_local: int,
    inv_d: float,
):
    g, t, d = x_ref.shape
    d_l = wqkv_ref.shape[0] // 3
    dtype = wqkv_ref.dtype
    row0 = pl.program_id(0) * group

    # ---- modulation head (replicated): (G, D) @ (6D, D)^T / sqrt(D) ---- #
    a_g = _row_select(a_ref, row0, group, dtype)  # (G, D) f32
    mods = jax.lax.dot_general(
        a_g.astype(dtype),
        wmod_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G, 6D): [shift|scale|gate]_msa, [shift|scale|gate]_mlp
    mods_ref[...] = mods.reshape(g, 6, d)

    # ---- attention partial on the local heads (== _attn_tp_kernel) ---- #
    x = x_ref[...].astype(jnp.float32)
    shift = mods[:, 0 * d : 1 * d].reshape(g, 1, d)
    scale = mods[:, 1 * d : 2 * d].reshape(g, 1, d)
    gain = gains_ref[0, 0]

    h_in = _modulate(x, shift, scale, gain)
    qkv = jax.lax.dot_general(
        h_in.reshape(g * t, d).astype(dtype),
        wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, 3*Dl)

    attn = _attention_core(qkv, g, t, d_l, heads_local, dtype)
    out = jax.lax.dot_general(
        attn.astype(dtype), wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, D) partial
    o_ref[...] = out.reshape(g, t, d)


def _block_tp_attn_impl(x, a, gains, w_mod, w_qkv_l, w_out_l, heads_local):
    """pallas_call wrapper for kernel 1; returns (partial, mods)."""
    n, t, d = x.shape
    d_l = w_qkv_l.shape[0] // 3
    weight_bytes = (6 * d * d + 4 * d * d_l) * w_qkv_l.dtype.itemsize
    budget_rows = max(t, ((_vmem_mb() - 1) * 2**20 - weight_bytes) // (24 * d))
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    return pl.pallas_call(
        functools.partial(
            _block_tp_kernel, group=g, heads_local=heads_local,
            inv_d=1.0 / math.sqrt(d),
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d_l, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # 3D (G, 6, D) block: a 2D (G, 6D) block would violate
            # Mosaic's sublane divisibility at small G (see _kernel's
            # a_ref note); as the trailing two dims, (6, D) just pads
            pl.BlockSpec((g, 6, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 6, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * 6 * d
            + 2 * n * t * d * (3 * d_l + d_l)
            + 4 * n * heads_local * t * t * (d_l // heads_local),
            bytes_accessed=(2 * n * t * d + 6 * d * d + 4 * d * d_l) * 2
            + 4 * n * t * d,
            transcendentals=n * heads_local * t * t,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(
        jnp.stack(
            [jnp.asarray(gains[0], jnp.float32), jnp.asarray(gains[1], jnp.float32)]
        ).reshape(1, 2),
        x, a, w_mod, w_qkv_l, w_out_l,
    )


def _mlp_tp_kernel(
    gains_ref,  # SMEM (1, 2): gain_msa (unused), gain_mlp
    x_ref,      # (G, T, D) post-attention residual stream
    shift_ref,  # (N, D) full, program_id-sliced (shift_mlp)
    scale_ref,  # (N, D) (scale_mlp)
    w1_ref,     # (Hl, D) LOCAL fc1 out-rows (column-parallel)
    w2_ref,     # (D, Hl) LOCAL fc2 in-columns (row-parallel)
    o_ref,      # (G, T, D) f32 out: PARTIAL fc2 projection
    *,
    group: int,
    inv_d: float,
    inv_h: float,
):
    """MLP half-block partial on a hidden-lane shard: modulate prologue +
    local fc1 + MP-SiLU (elementwise on local hidden lanes — the split is
    exact) + local fc2 in-columns. ``inv_h`` is 1/sqrt(H_GLOBAL): the MP
    fan-in normalization of fc2 uses the full hidden width, not Hl."""
    g, t, d = x_ref.shape
    dtype = w1_ref.dtype
    row0 = pl.program_id(0) * group

    x = x_ref[...].astype(jnp.float32)
    shift = _row_select(shift_ref, row0, group, dtype).reshape(g, 1, d)
    scale = _row_select(scale_ref, row0, group, dtype).reshape(g, 1, d)
    gain = gains_ref[0, 1]

    h_in = _modulate(x, shift, scale, gain)
    h1 = jax.lax.dot_general(
        h_in.reshape(g * t, d).astype(dtype),
        w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_d  # (G*T, Hl)
    h1 = (jax.nn.silu(h1) / _SILU_DIV).astype(dtype)
    h2 = jax.lax.dot_general(
        h1,
        w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_h  # (G*T, D) partial
    o_ref[...] = h2.reshape(g, t, d)


def _mlp_tp_partial_impl(x, shift, scale, gains, w1_l, w2_l, inv_h):
    n, t, d = x.shape
    h_l = w1_l.shape[0]
    weight_bytes = 2 * d * h_l * w1_l.dtype.itemsize
    budget_rows = max(
        t, ((_vmem_mb() - 1) * 2**20 - weight_bytes) // (16 * d + 8 * h_l)
    )
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * t <= budget_rows:
            g = cand
            break

    return pl.pallas_call(
        functools.partial(
            _mlp_tp_kernel, group=g, inv_d=1.0 / math.sqrt(d), inv_h=inv_h,
        ),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((h_l, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h_l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * d * 2 * h_l,
            bytes_accessed=(2 * n * t * d + 2 * d * h_l) * 2 + 4 * n * t * d,
            transcendentals=n * t * h_l,
        ),
        compiler_params=None if _interpret() else _compiler_params(),
        interpret=_interpret(),
    )(
        jnp.stack(
            [jnp.asarray(gains[0], jnp.float32), jnp.asarray(gains[1], jnp.float32)]
        ).reshape(1, 2),
        x, shift, scale, w1_l, w2_l,
    )


def _mlp_tp_partial_reference(x, shift, scale, gain, w1_l, w2_l, inv_h):
    """jnp oracle for the per-shard MLP partial (parity tests)."""
    n, t, d = x.shape
    zs = x * scale[:, None, :]
    denom = jnp.sqrt((1.0 - gain) ** 2 + gain**2)
    h = (zs + (shift[:, None, :] - zs) * gain) / denom
    h1 = h @ w1_l.T / math.sqrt(d)
    h1 = jax.nn.silu(h1) / _SILU_DIV
    return (h1 @ w2_l.T * inv_h).astype(jnp.float32)


def fused_dit_block_tp(
    x, a, gains, w_mod, w_qkv3, w_out_l, w1_l, w2_l, *,
    heads_local: int, hidden_total: int, axis_name: str,
):
    """Full-block tensor-parallel island for a shard_map body.

    ``w_qkv3``: (3, Dl, D) local head rows (see fused_attn_branch_tp);
    ``w_out_l``: (D, Dl); ``w1_l``: (Hl, D) local fc1 rows; ``w2_l``:
    (D, Hl) local fc2 columns; ``w_mod``: (6D, D) replicated.
    ``hidden_total`` = global MLP hidden width H (fc2's MP fan-in).
    Returns the updated residual stream, replicated over the model axis.
    Inference-only (no VJP on the partial kernels)."""
    three, d_l, d = w_qkv3.shape
    assert three == 3, w_qkv3.shape
    partial, mods = _block_tp_attn_impl(
        x, a, gains, w_mod, w_qkv3.reshape(3 * d_l, d), w_out_l, heads_local,
    )
    attn_out = jax.lax.psum(partial, axis_name)
    xf = x.astype(jnp.float32)
    branch = mods[:, 2][:, None, :] * attn_out  # gate_msa
    x1 = (xf + (branch - xf) * _RES_T) / _RES_DENOM

    mlp_partial = _mlp_tp_partial_impl(
        x1.astype(x.dtype), mods[:, 3], mods[:, 4], gains, w1_l, w2_l,
        inv_h=1.0 / math.sqrt(hidden_total),
    )
    mlp_out = jax.lax.psum(mlp_partial, axis_name)
    branch = mods[:, 5][:, None, :] * mlp_out  # gate_mlp
    x2 = (x1 + (branch - x1) * _RES_T) / _RES_DENOM
    return x2.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make(heads: int):
    @jax.custom_vjp
    def f(x, a, gains, w_mod, w_qkv, w_out, w1, w2):
        return _fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads)

    def fwd(x, a, gains, w_mod, w_qkv, w_out, w1, w2):
        return (
            _fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads),
            (x, a, gains, w_mod, w_qkv, w_out, w1, w2),
        )

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *args: _reference(*args, heads), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_dit_block(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads: int):
    """One whole DiT block in a single Pallas kernel.

    x (N,T,D) residual stream; a (N,D) = mp_silu(c); gains (2,) =
    [gain_msa, gain_mlp]; weights pre-normalized: w_mod (6D,D), w_qkv
    (3D,D), w_out (D,D), w1 (H,D), w2 (D,H). Returns the updated stream.
    Training-safe: the VJP recomputes through the jnp reference path.
    """
    return _make(heads)(x, a, gains, w_mod, w_qkv, w_out, w1, w2)


# ---------------------------------------------------------------------------
# Whole-STACK megakernel: all ``depth`` blocks in ONE pallas_call.
#
# The single-block kernel still pays, per model call, 12 kernel launches and
# 12 HBM round-trips of the (N, T, D) residual stream (~75 MB/step at the
# S/2 headline protocol). Here the grid is (depth, N/G): the residual stream
# lives in a persistent VMEM scratch across the whole stack (read from HBM
# once at block 0, written once at block depth-1), and each block's weights
# stream in per outer grid step via block-indexed BlockSpecs — Mosaic
# double-buffers them, so the per-block weight DMA hides behind the previous
# block's compute (which a sequence of separate pallas_calls cannot do).
# ---------------------------------------------------------------------------


def _stack_kernel(
    gains_ref,  # SMEM (depth, 2): per-block [gain_msa, gain_mlp]
    x_ref,      # (G, T, D) block i of the input stream (consumed at b == 0)
    a_ref,      # (N, D) full array (shared by all blocks)
    wmod_ref,   # (1, 6D, D) block b
    wqkv_ref,   # (1, 3D, D)
    wout_ref,   # (1, D, D)
    w1_ref,     # (1, H, D)
    w2_ref,     # (1, D, H)
    o_ref,      # (G, T, D) block i of the output stream
    xs_ref,     # VMEM scratch (N, T, D) x.dtype — persists across the grid
    *,
    group: int,
    heads: int,
    inv_d: float,
    inv_h: float,
):
    g, t, d = x_ref.shape
    dtype = wqkv_ref.dtype
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * group

    @pl.when(b == 0)
    def _():
        # the first block seeds the resident stream from the HBM input
        # (later blocks read the previous block's in-scratch result;
        # leading-dim dynamic indexing is plain address arithmetic — the
        # (T, D) tile layout is untouched)
        xs_ref[pl.ds(row0, g)] = x_ref[...]

    x = xs_ref[pl.ds(row0, g)].astype(jnp.float32)
    a_g = _row_select(a_ref, row0, group, dtype)
    x = _block_body(
        x, a_g, gains_ref[b, 0], gains_ref[b, 1],
        wmod_ref[0], wqkv_ref[0], wout_ref[0], w1_ref[0], w2_ref[0],
        heads=heads, inv_d=inv_d, inv_h=inv_h,
    )
    res = x.astype(xs_ref.dtype)
    xs_ref[pl.ds(row0, g)] = res
    # every (b, i) writes its block; the sequential grid makes block
    # depth-1's write land last, so HBM holds the final stream
    o_ref[...] = res


def _stack_reference(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads):
    """Depth-loop of the single-block reference (VJP + parity oracle).
    gains (depth, 2); weights (depth, ...)."""
    for b in range(w_mod.shape[0]):
        x = _reference(
            x, a, gains[b], w_mod[b], w_qkv[b], w_out[b], w1[b], w2[b], heads
        )
    return x


def _stack_fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads):
    depth = w_mod.shape[0]
    n, t, d = x.shape
    h_mlp = w1.shape[1]
    # Group sizing: like _fwd_impl, but the budget must also hold TWO
    # weight sets (Mosaic double-buffers the block-indexed weight specs)
    # and the (N, T, D) resident-stream scratch.
    weight_bytes = ((6 + 3 + 1) * d * d + 2 * d * h_mlp) * x.dtype.itemsize
    scratch_bytes = n * t * d * x.dtype.itemsize
    # Self-sizing VMEM scope: Mosaic's default 16 MB cannot hold the
    # double-buffered weights + scratch at any useful group (S collapses
    # to g=1, measured 372.9 steps/s vs 625.8 at 32 MB — BENCH_NOTES
    # r03s5), so this kernel raises its own scope: at least the measured
    # 32 MB, or what the working set needs, capped at 96 of the 128 MB
    # physical. MAPDIT_MEGA_VMEM_MB still overrides for A/B probes.
    if os.environ.get("MAPDIT_MEGA_VMEM_MB"):
        scope_mb = _vmem_mb()
    else:
        need_mb = -(
            -(3 * 2**20 + 2 * weight_bytes + scratch_bytes + 5 * 2**20)
            // 2**20
        )
        scope_mb = max(32, min(96, need_mb))
    if (
        not _interpret()
        and not os.environ.get("MAPDIT_MEGA_VMEM_MB")
        # an explicit scope override is an A/B probe (e.g. the 16 MB
        # baseline row in BENCH_NOTES r03s5 — infeasible by this check yet
        # it runs, just group-collapsed): let Mosaic be the arbiter there;
        # the guard protects only the self-sized path, whose 8 MB headroom
        # makes it unreachable below the 96 MB cap by construction
        and 2 * weight_bytes + scratch_bytes > (scope_mb - 8) * 2**20
    ):
        # XL-class stacks (45.6 MB bf16 weights, double-buffered) cannot
        # fit the 96 MB scope cap next to the resident stream — fail with
        # a diagnosis instead of Mosaic's VMEM-OOM compile error
        raise ValueError(
            f"mega_stack working set (2x{weight_bytes/2**20:.1f} MB weights "
            f"+ {scratch_bytes/2**20:.1f} MB resident stream) exceeds the "
            f"{scope_mb} MB VMEM scope at D={d}, N={n}, T={t} — use "
            "block_kernel='mega_attn' (or 'auto') at this scale"
        )
    budget_rows = max(
        t,
        ((scope_mb - 3) * 2**20 - 2 * weight_bytes - scratch_bytes)
        // (24 * d + 8 * t),
    )
    g = 1
    for want_fill in (True, False):
        for cand in (8, 4, 2):
            if (n % cand == 0 and cand * t <= budget_rows
                    and (cand * t >= 256 or not want_fill)):
                g = cand
                break
        else:
            continue
        break
    force = os.environ.get("MAPDIT_MEGA_FORCE_GROUP")
    if force:
        f = int(force)
        if n % f == 0:
            g = f
        elif n >= f:
            # a real batch that cannot take the forced group is a probe
            # mistake — fail loudly rather than silently measuring auto-g
            raise ValueError(f"MAPDIT_MEGA_FORCE_GROUP={f} does not divide n={n}")
        # else: the n < f case is the model-init trace (n=1); auto-g applies

    return pl.pallas_call(
        functools.partial(
            _stack_kernel,
            group=g,
            heads=heads,
            inv_d=1.0 / math.sqrt(d),
            inv_h=1.0 / math.sqrt(h_mlp),
        ),
        grid=(depth, n // g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gains (depth, 2) full
            # x is only CONSUMED at b == 0 (later blocks read the resident
            # scratch); pinning the index to block 0 for b > 0 makes the
            # block index constant across those steps, so the Pallas
            # pipeline elides the (depth-1) * N*T*D re-fetch DMAs the
            # naive (i, 0, 0) map would issue. (depth - b) // depth = 1
            # at b == 0, else 0 — index-map-legal integer arithmetic.
            pl.BlockSpec(
                (g, t, d),
                lambda b, i: (i * ((depth - b) // depth), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a (N, D) full
            pl.BlockSpec((1, 6 * d, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_mlp, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, h_mlp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        # only block depth-1's results are the real output; parking every
        # earlier write on block 0 keeps the out index constant there, so
        # the pipeline flushes HBM only around the final block's sweep
        # (the b < depth-1 writes land garbage in block 0, which
        # (depth-1, 0) then overwrites — the sequential grid orders it).
        # b // (depth - 1) = 1 only at b == depth-1 (depth >= 2).
        out_specs=pl.BlockSpec(
            (g, t, d),
            (lambda b, i: (i, 0, 0)) if depth == 1
            else (lambda b, i: (i * (b // (depth - 1)), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, t, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, t, d), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=depth
            * (
                2 * n * d * 6 * d
                + 2 * n * t * d * (3 * d + d + 2 * h_mlp)
                + 4 * n * heads * t * t * (d // heads)
            ),
            bytes_accessed=(
                2 * n * t * d
                + depth * ((6 + 3 + 1) * d * d + 2 * d * h_mlp)
            ) * 2,
            transcendentals=depth * (n * t * h_mlp + n * heads * t * t),
        ),
        compiler_params=None
        if _interpret()
        else pltpu.CompilerParams(vmem_limit_bytes=scope_mb * 2**20),
        interpret=_interpret(),
    )(gains.astype(jnp.float32), x, a, w_mod, w_qkv, w_out, w1, w2)


@functools.lru_cache(maxsize=None)
def _make_stack(heads: int):
    @jax.custom_vjp
    def f(x, a, gains, w_mod, w_qkv, w_out, w1, w2):
        return _stack_fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads)

    def fwd(x, a, gains, w_mod, w_qkv, w_out, w1, w2):
        return (
            _stack_fwd_impl(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads),
            (x, a, gains, w_mod, w_qkv, w_out, w1, w2),
        )

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *args: _stack_reference(*args, heads), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_dit_stack(x, a, gains, w_mod, w_qkv, w_out, w1, w2, heads: int):
    """The ENTIRE DiT block stack in a single Pallas kernel.

    x (N,T,D) residual stream; a (N,D) = mp_silu(c) shared by all blocks;
    gains (depth, 2); weights depth-stacked and pre-normalized: w_mod
    (depth,6D,D), w_qkv (depth,3D,D), w_out (depth,D,D), w1 (depth,H,D),
    w2 (depth,D,H). Returns the updated stream. The VJP recomputes through
    the jnp reference path (inference is the target; training keeps XLA).
    """
    return _make_stack(heads)(x, a, gains, w_mod, w_qkv, w_out, w1, w2)
