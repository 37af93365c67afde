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
import time

import jax
import jax.numpy as jnp

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.runtime import build_sample_fn

# torch eager reference, DiT-S/2, batch 32x2 CFG, 250-respaced DDPM steps
# (tools/measure_reference_baseline.py, this container, 2026-08-16)
TORCH_EAGER_BASELINE_STEPS_PER_SEC = 0.2042


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32, help="pre-CFG batch")
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--model", default="DiT-S/2")
    args = p.parse_args()

    cfg = build_config(
        args.model,
        in_channels=4,
        input_size=16,
        num_classes=1000,
        compute_dtype=args.dtype,
    )
    model, variables = init_model(cfg, seed=0)
    diffusion = create_diffusion(str(args.steps))
    sample_fn = build_sample_fn(cfg, variables, diffusion, cfg_scale=1.5, fold=True)

    n = args.batch
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2 * n, 4, 16, 16))
    y = jnp.concatenate(
        [jax.random.randint(key, (n,), 0, 1000), jnp.full((n,), 1000, jnp.int32)]
    )

    # compile + warmup
    sample_fn(z, y, jax.random.PRNGKey(1)).block_until_ready()

    times = []
    for i in range(args.repeats):
        start = time.perf_counter()
        sample_fn(z, y, jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.perf_counter() - start)

    best = min(times)
    value = args.steps / best  # full-chain denoise steps per second, one chip
    print(
        json.dumps(
            {
                "metric": "denoise_steps_per_sec_per_chip",
                "value": round(value, 3),
                "unit": f"DDPM steps/s (DiT-S/2, batch {n}x2 CFG, {args.steps} respaced steps, {args.dtype})",
                "vs_baseline": round(value / TORCH_EAGER_BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
