#!/usr/bin/env python
"""Headline benchmark: denoise steps/sec/chip (BASELINE.md north-star).

DiT-S/2 on 4x16x16 latents (the shipped-dataset configuration), batched CFG
(batch 32 x2), 250-step respaced DDPM chain as one jitted lax.scan, weights
folded for inference. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the PyTorch reference's eager throughput measured
with tools/measure_reference_baseline.py on this container's CPU
(single-threaded eager, identical shapes/steps): 0.2042 denoise steps/sec.
The driver-defined target is >=5x (BASELINE.json).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.runtime import build_sample_fn
from mapdit_tpu.utils.compile_cache import enable_compile_cache

# torch eager reference, DiT-S/2, batch 32x2 CFG, 250-respaced DDPM steps
# (tools/measure_reference_baseline.py, this container, 2026-08-16)
TORCH_EAGER_BASELINE_STEPS_PER_SEC = 0.2042


def _peak_flops(device_kind: str):
    """bf16 peak FLOP/s for the MFU estimate (None if unknown)."""
    kind = device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    return None


def _mfu_pct(step_fn, example_args, steps: int, chain_seconds: float):
    """Model-FLOPs utilization: per-step compiled FLOPs x steps / wall time
    / device peak. The per-STEP program is analyzed because XLA's
    cost_analysis counts a scan body once, not trip-count times."""
    try:
        comp = jax.jit(step_fn).lower(*example_args).compile()
        flops = float((comp.cost_analysis() or {}).get("flops", 0.0))
        peak = _peak_flops(jax.devices()[0].device_kind)
        if flops > 0 and peak:
            return round(100.0 * flops * steps / chain_seconds / peak, 2)
    except Exception as e:  # diagnostic only — never fail the bench
        import sys

        print(f"mfu estimate failed: {e!r}", file=sys.stderr)
    return None


def _gate_relay(args, stats):
    """Refuse (--require-healthy-relay) or loudly flag a degraded window."""
    if stats["healthy"]:
        return
    import sys

    msg = (
        f"relay probe DEGRADED: tiny-op p50 {stats['p50_ms']} ms > "
        f"{stats['healthy_ms']} ms healthy ceiling (r04 postmortem band)"
    )
    if getattr(args, "require_healthy_relay", False):
        print(json.dumps({"error": "relay_degraded", **stats}), file=sys.stderr)
        raise SystemExit(3)
    print(f"WARNING: {msg} — row stamped relay_healthy=false", file=sys.stderr)


def bench_train(args, cfg):
    """Secondary metric: train steps/sec at DiT-S/2 (BASELINE.md)."""
    from mapdit_tpu.training import (
        create_optimizer,
        create_train_state,
        make_train_step,
        warmup_flat_invsqrt,
    )
    from mapdit_tpu.training.data import SyntheticLatentDataset

    diffusion = create_diffusion("")
    ds = SyntheticLatentDataset(
        num_examples=max(1024, 2 * args.batch), num_classes=1000,
        size=args.input_size,
    )
    tx = create_optimizer(warmup_flat_invsqrt(1e-2, 100, 1000))
    step_fn = jax.jit(
        make_train_step(
            cfg,
            diffusion,
            tx,
            stats_mean=jnp.asarray(ds.stats["mean"]),
            stats_std=jnp.asarray(ds.stats["std"]),
            grad_accum=args.grad_accum,
        ),
        donate_argnums=0,
    )
    state = create_train_state(cfg, tx, seed=0)
    batches = ds.batches(batch_size=args.batch, seed=0)

    if args.resident_data:
        # Device-resident batch, reused every step: isolates pure device
        # train throughput from the per-step host->device batch upload
        # (which pays the full axon relay cost in this container — a
        # direct-attached host with the native prefetch loader would not).
        fixed = {k: jax.device_put(jnp.asarray(v)) for k, v in next(batches).items()}
        import itertools

        batches = itertools.repeat(fixed)

    state, m = step_fn(state, next(batches))  # compile
    jax.block_until_ready(m["loss"])

    if args.profile_dir:
        # On-chip trace of a few train steps (before the timed run so the
        # trace overhead never pollutes the number); analyze with
        # tools/trace_breakdown.py — same artifact layout as sample mode.
        import sys

        jax.profiler.start_trace(args.profile_dir, create_perfetto_trace=True)
        for _ in range(5):
            state, m = step_fn(state, next(batches))
        jax.block_until_ready(m["loss"])
        jax.profiler.stop_trace()
        try:
            hlo = step_fn.lower(state, next(batches)).compile().as_text()
            with open(os.path.join(args.profile_dir, "train_step_hlo.txt"), "w") as f:
                f.write(hlo)
        except Exception as e:  # trace remains useful without it
            print(f"hlo dump failed: {e!r}", file=sys.stderr)
        print(f"trace written to {args.profile_dir}", file=sys.stderr)

    from mapdit_tpu.utils.relay_health import probe_relay

    relay_pre = probe_relay()
    _gate_relay(args, relay_pre)

    n_steps = max(args.steps, 10)
    start = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_fn(state, next(batches))
    jax.block_until_ready(m["loss"])
    elapsed = time.perf_counter() - start
    relay_post = probe_relay()

    # per-step MFU (fwd + bwd + optimizer); with --scan-blocks the depth
    # scan's body is counted once by cost_analysis, under-reporting.
    mfu = _mfu_pct(step_fn, (state, next(batches)), n_steps, elapsed)
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec",
                "value": round(n_steps / elapsed, 3),
                "unit": (
                    f"steps/s ({args.model}, batch {args.batch}"
                    + (f" accum {args.grad_accum}" if args.grad_accum > 1 else "")
                    + (", resident-data" if args.resident_data else "")
                    + f", {args.dtype})"
                ),
                "vs_baseline": None,
                "mfu_pct": mfu,
                "dispatch_ms": relay_pre["p50_ms"],
                "relay": {"pre": relay_pre, "post": relay_post},
                "relay_healthy": relay_pre["healthy"] and relay_post["healthy"],
            }
        )
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32, help="pre-CFG batch")
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--model", default="DiT-S/2")
    p.add_argument("--input-size", type=int, default=16,
                   help="latent side (16 = shipped ImageNet-128 dataset, T=64 "
                        "tokens at p=2; 32 = the DiT-paper ImageNet-256 regime, "
                        "T=256)")
    p.add_argument("--attention-impl",
                   choices=["auto", "xla", "pallas", "pallas_v2", "pallas_v3"],
                   default="auto")
    p.add_argument("--block-kernel",
                   choices=["auto", "pallas", "mega", "mega_attn",
                            "mega_stack", "off"],
                   default="auto")
    p.add_argument("--scan-blocks", action="store_true",
                   help="lax.scan over depth-stacked block params (XL compile time)")
    p.add_argument("--attn-bwd", choices=["pallas", "residual", "reference"],
                   default="pallas",
                   help="train mode with --block-kernel mega_attn: VJP for the "
                        "attention half-block kernel (pallas = fused backward "
                        "kernel; residual = residual-emitting forward + pure-XLA "
                        "backward, no recompute; reference = jnp recompute)")
    p.add_argument("--remat", action="store_true",
                   help="per-block activation rematerialization (XL-scale train memory)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="train mode: micro-batch gradient accumulation factor")
    p.add_argument("--resident-data", action="store_true",
                   help="train mode: reuse one device-resident batch — pure "
                        "device throughput, no per-step host upload")
    p.add_argument("--cache-interval", type=int, default=0,
                   help="sample mode: Delta-DiT block-span caching — recompute "
                        "the middle-half block span only every N steps (0 = "
                        "exact chain). LOSSY: see BENCH_NOTES deviation numbers")
    p.add_argument("--cache-span", type=str, default=None,
                   help="lo,hi block span to cache (default middle half)")
    p.add_argument("--cache-mode", choices=["hold", "forecast"], default="forecast",
                   help="skip-step span delta: hold (Delta-DiT) or linear "
                        "forecast (static Predict-to-Skip) — same FLOPs. "
                        "forecast is the default: smaller deviation at every "
                        "(sampler, k) on every trained checkpoint probed "
                        "(r03s7, r04 — BENCH_NOTES)")
    p.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                   metavar=("SIGMA_LO", "SIGMA_HI"),
                   help="sample mode: limited-interval guidance (arXiv "
                        "2404.07724) — CFG only where sigma(t) is in [LO, HI]; "
                        "unguided steps run cond-only at half the batch "
                        "(ddpm/dpm++; composes with --cache-interval)")
    p.add_argument("--mode", choices=["sample", "train"], default="sample",
                   help="sample = headline denoise-steps/sec; train = train steps/sec")
    p.add_argument("--sampler", choices=["ddpm", "ddim", "dpm++", "unipc"], default="ddpm",
                   help="chain family for sample mode (ddim = eta-0 chain)")
    p.add_argument("--time-schedule", choices=["uniform", "karras"], default="uniform")
    p.add_argument("--scan-unroll", type=int, default=1,
                   help="lax.scan unroll factor for the fast DDPM chain")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace (with perfetto json) of "
                        "one timed chain run into this directory; analyze with "
                        "tools/trace_breakdown.py")
    p.add_argument("--probe-relay", action="store_true",
                   help="run ONLY the relay-health probe (tiny-op dispatch "
                        "round-trip) and print its JSON row; exit 3 if the "
                        "p50 is outside the healthy band")
    p.add_argument("--require-healthy-relay", action="store_true",
                   help="refuse to record a row when the pre-measurement "
                        "relay probe is degraded (exit 3) instead of "
                        "stamping relay_healthy=false")
    p.add_argument("--prng", choices=["threefry", "rbg"], default="threefry",
                   help="PRNG impl for sampler step noise. A/B at the "
                        "250-step protocol measured NO difference (410.0 vs "
                        "409.5 steps/s) — step noise is not on the critical "
                        "path at these shapes; flag kept for larger-shape "
                        "re-tests")
    args = p.parse_args()
    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(
        float(os.environ.get("MAPDIT_BACKEND_TIMEOUT_S", "300")), label="bench"
    )

    if args.probe_relay:
        from mapdit_tpu.utils.relay_health import probe_relay

        row = probe_relay()
        print(
            json.dumps(
                {
                    "metric": "relay_dispatch_ms_p50",
                    "value": row["p50_ms"],
                    "unit": "ms (tiny-op sync round-trip; healthy <= "
                            f"{row['healthy_ms']:g} ms)",
                    "vs_baseline": None,
                    "relay": row,
                }
            )
        )
        return 0 if row["healthy"] else 3

    cfg = build_config(
        args.model,
        in_channels=4,
        input_size=args.input_size,
        num_classes=1000,
        compute_dtype=args.dtype,
        attention_impl=args.attention_impl,
        block_kernel=args.block_kernel,
        scan_blocks=args.scan_blocks,
        remat=args.remat,
        attn_bwd=args.attn_bwd,
    )
    if args.mode == "train":
        return bench_train(args, cfg)
    model, variables = init_model(cfg, seed=0)
    from mapdit_tpu.diffusion import respacing_string

    diffusion = create_diffusion(
        respacing_string(args.steps, args.sampler, args.time_schedule)
    )
    if args.cache_interval > 1:
        from mapdit_tpu.runtime import build_cached_sample_fn

        assert args.sampler in ("ddpm", "dpm++"), (
            "--cache-interval composes with --sampler ddpm or dpm++"
        )
        span = (
            tuple(int(v) for v in args.cache_span.split(","))
            if args.cache_span
            else None
        )
        sample_fn = build_cached_sample_fn(
            cfg, variables, diffusion, cfg_scale=1.5, fold=True,
            span=span, cache_interval=args.cache_interval, sampler=args.sampler,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            cache_mode=args.cache_mode,
        )
    else:
        sample_fn = build_sample_fn(
            cfg, variables, diffusion, cfg_scale=1.5, fold=True, sampler=args.sampler,
            scan_unroll=args.scan_unroll,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            batch_hint=args.batch,
        )

    n = args.batch
    z_key, y_key = jax.random.split(jax.random.PRNGKey(0))
    z = jax.random.normal(z_key, (2 * n, 4, args.input_size, args.input_size))
    y = jnp.concatenate(
        [jax.random.randint(y_key, (n,), 0, 1000), jnp.full((n,), 1000, jnp.int32)]
    )
    # typed step-noise key: its impl propagates to every split/normal in
    # the scan (legacy uint32 keys would be re-wrapped as threefry)
    impl = {"threefry": "threefry2x32", "rbg": "rbg"}[args.prng]
    chain_key = lambda s: jax.random.key(s, impl=impl)

    # compile + warmup
    sample_fn(z, y, chain_key(1)).block_until_ready()

    if args.profile_dir:
        # On-chip trace of ONE full chain (separate from the timed repeats
        # so the trace overhead never pollutes the headline number).
        jax.profiler.start_trace(args.profile_dir, create_perfetto_trace=True)
        sample_fn(z, y, chain_key(99)).block_until_ready()
        jax.profiler.stop_trace()
        import sys

        # compiled HLO next to the trace: tools/trace_breakdown.py uses the
        # fused-computation op_name metadata to attribute opaque fusion.N
        # trace events to model stages (attention / mlp / modulation / ...)
        try:
            hlo = (
                jax.jit(sample_fn)
                .lower(z, y, chain_key(1))
                .compile()
                .as_text()
            )
            with open(os.path.join(args.profile_dir, "chain_hlo.txt"), "w") as f:
                f.write(hlo)
        except Exception as e:  # trace remains useful without it
            print(f"hlo dump failed: {e!r}", file=sys.stderr)
        print(f"trace written to {args.profile_dir}", file=sys.stderr)

    # Relay-health watchdog (VERDICT r04 #5): probe BEFORE and AFTER the
    # timed window so the row carries evidence that the whole measurement
    # sat inside a healthy relay band — a 10x dispatch degradation mid-run
    # (r04 postmortem) otherwise masquerades as a code regression.
    from mapdit_tpu.utils.relay_health import probe_relay

    relay_pre = probe_relay()
    _gate_relay(args, relay_pre)

    times = []
    for i in range(args.repeats):
        start = time.perf_counter()
        sample_fn(z, y, chain_key(2 + i)).block_until_ready()
        times.append(time.perf_counter() - start)

    best = min(times)
    value = args.steps / best  # full-chain denoise steps per second, one chip

    relay_post = probe_relay()
    dispatch_ms = relay_pre["p50_ms"]

    # per-step MFU: one CFG model forward is ~all of a chain step's FLOPs.
    # The forward is analyzed UNROLLED (scan_blocks=False — XLA's
    # cost_analysis counts a scan body once) with abstract shape-only
    # variables, so nothing is materialized and the lowered HLO carries no
    # weight constants (the axon remote-compile relay rejects >100 MB).
    from mapdit_tpu.models.dit import DiT

    cfg_flat = cfg.replace(scan_blocks=False)
    fwd_model = DiT(cfg_flat)

    def fwd(v, x, t, y):
        return fwd_model.apply(v, x, t, y, 1.5, method=DiT.forward_with_cfg)

    var_shapes = jax.eval_shape(lambda: init_model(cfg_flat, seed=0)[1])
    t_vec = jnp.zeros((2 * n,), jnp.float32)
    if args.cache_interval > 1:
        # skip steps don't execute the cached span: the full-forward FLOPs
        # estimate would overstate utilization — report no MFU rather than
        # a wrong one
        mfu = None
    else:
        eff_steps = args.steps
        if args.cfg_interval:
            # unguided steps run the cond-only model at HALF the CFG batch;
            # all model FLOPs are batch-linear, so they count as half a step
            from mapdit_tpu.runtime import cfg_interval_segments

            g0, g1 = cfg_interval_segments(diffusion, *args.cfg_interval)
            eff_steps = (g1 - g0) + (args.steps - (g1 - g0)) * 0.5
        mfu = _mfu_pct(fwd, (var_shapes, z, t_vec, y), eff_steps, best)

    print(
        json.dumps(
            {
                "metric": "denoise_steps_per_sec_per_chip",
                "value": round(value, 3),
                "unit": (
                    f"{args.sampler.upper()} steps/s ({args.model}, batch {n}x2 CFG, "
                    f"{args.steps} respaced steps"
                    + (f", {args.time_schedule}" if args.time_schedule != "uniform" else "")
                    + (f", cache-interval {args.cache_interval}" if args.cache_interval > 1 else "")
                    + (
                        f", cache-mode {args.cache_mode}"
                        if args.cache_interval > 1 and args.cache_mode != "hold" else ""
                    )
                    + (
                        f", cfg-interval {args.cfg_interval[0]:g}-{args.cfg_interval[1]:g}"
                        if args.cfg_interval else ""
                    )
                    + f", {args.dtype})"
                ),
                "vs_baseline": round(value / TORCH_EAGER_BASELINE_STEPS_PER_SEC, 2),
                "mfu_pct": mfu,
                "dispatch_ms": dispatch_ms,
                "relay": {"pre": relay_pre, "post": relay_post},
                "relay_healthy": relay_pre["healthy"] and relay_post["healthy"],
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
