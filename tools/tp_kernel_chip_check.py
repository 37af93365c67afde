"""On-chip Mosaic-lowering + parity check for the TP island kernels.

The shard_map islands (`block_kernel='mega_attn_tp'` / the full-block
`'mega_tp'`) cannot run with tp>1 on the single axon chip, but their
per-shard Pallas programs are plain pallas_calls with no collectives — so
the SPLIT geometries (Dl = D/tp lane widths, 3*Dl-row qkv weights, Hl =
H/tp hidden rows/cols) can be compiled and parity-checked against the jnp
oracles directly on real hardware. This closes the Mosaic half of the
"single-chip equivalence" leg for all three kernels (attention partial,
block kernel 1 = modhead+attention, MLP partial); the psum wrappers are
GSPMD-standard and covered by the virtual-mesh tests.

Run: python tools/tp_kernel_chip_check.py   (TPU; queue sequentially)
"""

import sys
import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mapdit_tpu.ops.pallas.dit_block import (  # noqa: E402
    _attn_tp_partial_impl,
    _attn_tp_partial_reference,
    _block_tp_attn_impl,
    _mlp_tp_partial_impl,
    _mlp_tp_partial_reference,
)


def _time_fn(fn, *args):
    """Warm per-call wall time (relay-optimistic; lowering evidence only)."""
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / 20


def check(name, n, t, d, heads, tp):
    heads_local = heads // tp
    hd = d // heads
    d_l = heads_local * hd
    # crc32, not hash(): str hash is salted per interpreter, which would
    # make a marginal rel_err irreproducible across runs
    ks = jax.random.split(jax.random.PRNGKey(zlib.crc32(name.encode())), 6)
    x = jax.random.normal(ks[0], (n, t, d), jnp.float32).astype(jnp.bfloat16)
    shift = (jax.random.normal(ks[1], (n, d)) * 0.1).astype(jnp.bfloat16)
    scale = (jax.random.normal(ks[2], (n, d)) * 0.1 + 1.0).astype(jnp.bfloat16)
    gain = jnp.float32(0.3)
    w_qkv_l = (jax.random.normal(ks[3], (3 * d_l, d)) / np.sqrt(d)).astype(jnp.bfloat16)
    w_out_l = (jax.random.normal(ks[4], (d, d_l)) / np.sqrt(d)).astype(jnp.bfloat16)

    fn = jax.jit(
        lambda *a: _attn_tp_partial_impl(*a, heads_local=heads_local)
    )
    out = np.asarray(fn(x, shift, scale, gain, w_qkv_l, w_out_l))
    ref = np.asarray(
        _attn_tp_partial_reference(
            x.astype(jnp.float32), shift.astype(jnp.float32),
            scale.astype(jnp.float32), gain,
            w_qkv_l.astype(jnp.float32), w_out_l.astype(jnp.float32),
            heads_local,
        )
    )
    denom = np.max(np.abs(ref)) + 1e-9
    err = np.max(np.abs(out - ref)) / denom
    # bf16 operands: ~1e-2 relative worst-case is in-family for the kernels
    ok = err < 2e-2
    dt = _time_fn(fn, x, shift, scale, gain, w_qkv_l, w_out_l)
    print(
        f"{name} attn: n={n} t={t} d={d} heads={heads} tp={tp} (Dl={d_l}) "
        f"rel_err={err:.2e} {'OK' if ok else 'FAIL'} {dt*1e6:.0f} us/call"
    )
    # evaluate ALL legs even when one fails: each chip run costs a
    # sequential TPU slot, and hiding the block/MLP lowering status
    # behind a failing attn leg wastes a full queue cycle (r05 review)
    ok_block = check_block(name, n, t, d, heads, tp)
    ok_mlp = check_mlp(name, n, t, d, tp)
    return ok and ok_block and ok_mlp


def check_block(name, n, t, d, heads, tp):
    """Kernel 1 of the full-block island: modulation head + attn partial."""
    heads_local = heads // tp
    d_l = heads_local * (d // heads)
    ks = jax.random.split(jax.random.PRNGKey(zlib.crc32(name.encode()) + 1), 6)
    x = jax.random.normal(ks[0], (n, t, d), jnp.float32).astype(jnp.bfloat16)
    a = jax.random.normal(ks[1], (n, d)).astype(jnp.bfloat16)
    gains = jnp.asarray([0.3, 0.6], jnp.float32)
    w_mod = (jax.random.normal(ks[2], (6 * d, d)) / np.sqrt(d)).astype(jnp.bfloat16)
    w_qkv_l = (jax.random.normal(ks[3], (3 * d_l, d)) / np.sqrt(d)).astype(jnp.bfloat16)
    w_out_l = (jax.random.normal(ks[4], (d, d_l)) / np.sqrt(d)).astype(jnp.bfloat16)

    fn = jax.jit(
        lambda *args: _block_tp_attn_impl(*args, heads_local=heads_local)
    )
    out, mods = fn(x, a, gains, w_mod, w_qkv_l, w_out_l)
    out, mods = np.asarray(out), np.asarray(mods)
    f32 = lambda z: z.astype(jnp.float32)
    mods_ref = np.asarray((f32(a) @ f32(w_mod).T) / np.sqrt(d))
    shift, scale = mods_ref[:, :d], mods_ref[:, d : 2 * d]
    ref = np.asarray(
        _attn_tp_partial_reference(
            f32(x), jnp.asarray(shift), jnp.asarray(scale), gains[0],
            f32(w_qkv_l), f32(w_out_l), heads_local,
        )
    )
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    err_m = np.max(np.abs(mods - mods_ref.reshape(n, 6, d))) / (
        np.max(np.abs(mods_ref)) + 1e-9
    )
    ok = err < 2e-2 and err_m < 2e-2
    dt = _time_fn(fn, x, a, gains, w_mod, w_qkv_l, w_out_l)
    print(
        f"{name} block-k1: rel_err={err:.2e} mods_err={err_m:.2e} "
        f"{'OK' if ok else 'FAIL'} {dt*1e6:.0f} us/call"
    )
    return ok


def check_mlp(name, n, t, d, tp):
    """Kernel 2: the hidden-sharded MLP partial (Hl = 4D/tp)."""
    h = 4 * d
    if h % tp:
        print(f"{name} mlp: hidden {h} % tp {tp} != 0 — skipped")
        return True
    h_l = h // tp
    ks = jax.random.split(jax.random.PRNGKey(zlib.crc32(name.encode()) + 2), 6)
    x = jax.random.normal(ks[0], (n, t, d), jnp.float32).astype(jnp.bfloat16)
    shift = (jax.random.normal(ks[1], (n, d)) * 0.1).astype(jnp.bfloat16)
    scale = (jax.random.normal(ks[2], (n, d)) * 0.1 + 1.0).astype(jnp.bfloat16)
    gains = jnp.asarray([0.3, 0.6], jnp.float32)
    w1_l = (jax.random.normal(ks[3], (h_l, d)) / np.sqrt(d)).astype(jnp.bfloat16)
    w2_l = (jax.random.normal(ks[4], (d, h_l)) / np.sqrt(h)).astype(jnp.bfloat16)
    inv_h = 1.0 / np.sqrt(h)

    fn = jax.jit(lambda *args: _mlp_tp_partial_impl(*args, inv_h=inv_h))
    out = np.asarray(fn(x, shift, scale, gains, w1_l, w2_l))
    f32 = lambda z: z.astype(jnp.float32)
    ref = np.asarray(
        _mlp_tp_partial_reference(
            f32(x), f32(shift), f32(scale), gains[1], f32(w1_l), f32(w2_l),
            inv_h,
        )
    )
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    ok = err < 2e-2
    dt = _time_fn(fn, x, shift, scale, gains, w1_l, w2_l)
    print(
        f"{name} mlp: Hl={h_l} rel_err={err:.2e} "
        f"{'OK' if ok else 'FAIL'} {dt*1e6:.0f} us/call"
    )
    return ok


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    cases = [
        # S-class: D=384, 6 heads — tp 2 and 3
        ("S tp2", 64, 64, 384, 6, 2),
        ("S tp3", 64, 64, 384, 6, 3),
        # B-class: D=768, 12 heads — tp 2 and 4
        ("B tp2", 32, 64, 768, 12, 2),
        ("B tp4", 32, 64, 768, 12, 4),
        # XL-class: D=1152, 16 heads — tp 2 and 4
        ("XL tp2", 16, 64, 1152, 16, 2),
        ("XL tp4", 16, 64, 1152, 16, 4),
        # tp=1 degenerate (full heads — the mega_attn-equivalent geometry)
        ("S tp1", 64, 64, 384, 6, 1),
    ]
    results = [check(*c) for c in cases]  # no short-circuit across cases
    ok = all(results)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
