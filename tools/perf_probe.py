"""Perf breakdown by ablation: where does a denoise step's time go?

Measures on the current backend (run on the TPU):
  1. device matmul roofline (big bf16 matmul; unreliable through the axon
     relay's async dispatch — prefer whole-chain numbers)
  2. one jitted model forward_with_cfg (per-call, outside scan) + its MFU
     from the compiled program's FLOPs
  3. the scan sampler at two chain lengths -> fixed per-invocation overhead
     F and marginal per-step cost m (solve F + N*m)
  4. the scan sampler with a trivial model (sampler math + scan overhead)

Usage: python tools/perf_probe.py [--batch 32] [--steps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.runtime import build_model_fn, build_sample_fn


def timeit(fn, *args, n=10):
    fn(*args)  # compile+warm
    jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attention-impl", default="auto")
    p.add_argument("--block-kernel", default="auto",
                   help="auto = production dispatch (megakernel on TPU for "
                        "folded inference); off = pure XLA pipeline")
    args = p.parse_args()

    # 1. roofline
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda x: x @ x)
    t_mm = timeit(mm, a, n=20)
    print(f"roofline: {2 * m**3 / t_mm / 1e12:.1f} TFLOP/s (4096^3 bf16 matmul)")

    cfg = build_config(
        "DiT-S/2", in_channels=4, input_size=16, num_classes=1000,
        compute_dtype=args.dtype, attention_impl=args.attention_impl,
        block_kernel=args.block_kernel,
    )
    model, variables = init_model(cfg, seed=0)
    n = args.batch
    z = jax.random.normal(jax.random.PRNGKey(0), (2 * n, 4, 16, 16))
    y = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.full((n,), 1000, jnp.int32)]
    )
    tt = jnp.full((2 * n,), 500.0)

    # 2. bare forward (+ MFU from compiled FLOPs; variables as an argument
    # keep the lowered HLO small through the remote-compile relay)
    from mapdit_tpu.models.dit import DiT

    fwd_model = DiT(cfg)
    fwd = jax.jit(
        lambda v, x, t_, y_: fwd_model.apply(v, x, t_, y_, 1.5, method=DiT.forward_with_cfg)
    )
    t_fwd = timeit(fwd, variables, z, tt, y, n=30)
    line = f"model forward_with_cfg: {t_fwd*1e3:.3f} ms/call -> {1/t_fwd:.1f} calls/s"
    try:
        comp = fwd.lower(variables, z, tt, y).compile()
        flops = float((comp.cost_analysis() or {}).get("flops", 0.0))
        if flops:
            line += f", {flops/t_fwd/1e12:.1f} TFLOP/s effective"
    except Exception:
        pass
    print(line)

    # 3. real sampler at two chain lengths: solve F + N*m
    times = {}
    for steps in (args.steps, 2 * args.steps):
        d = create_diffusion(str(steps))
        sample_fn = build_sample_fn(cfg, variables, d, cfg_scale=1.5, fold=True)
        times[steps] = timeit(lambda sf=sample_fn: sf(z, y, jax.random.PRNGKey(1)), n=3)
    n1, n2 = args.steps, 2 * args.steps
    m_cost = (times[n2] - times[n1]) / (n2 - n1)
    fixed = times[n1] - n1 * m_cost
    t_chain, per_step = times[n1], times[n1] / n1
    print(
        f"scan sampler: {t_chain*1e3:.1f} ms/chain @ {n1} steps "
        f"({times[n2]*1e3:.1f} @ {n2}); marginal m = {m_cost*1e3:.3f} ms/step, "
        f"fixed F = {fixed*1e3:.1f} ms/invocation -> {n1/t_chain:.1f} steps/s"
    )
    d = create_diffusion(str(args.steps))

    # 4. sampler math only
    trivial = lambda x, t, y: jnp.concatenate([0.1 * x, jnp.tanh(x)], axis=1)

    @jax.jit
    def trivial_chain(noise, yy, rng):
        return d.p_sample_loop(trivial, noise, rng, clip_denoised=False, model_kwargs={"y": yy})

    t_triv = timeit(lambda: trivial_chain(z, y, jax.random.PRNGKey(1)), n=3)
    print(
        f"sampler-math-only scan: {t_triv*1e3:.1f} ms/chain "
        f"({t_triv/args.steps*1e3:.3f} ms/step overhead floor)"
    )
    print(
        f"breakdown per step: model {t_fwd*1e3:.3f} ms + sampler {t_triv/args.steps*1e3:.3f} ms "
        f"vs observed {per_step*1e3:.3f} ms"
    )
    print(
        "note: per-call and roofline timings are optimistic through async "
        "relays (axon) — trust the chain's marginal m and fixed F above"
    )


if __name__ == "__main__":
    main()
