"""Measure the reference implementation's eager denoise-step throughput.

Runs the PyTorch reference (path arg) DiT-S/2 with batched CFG through a few
respaced-DDPM steps and prints steps/sec. The result is pinned in bench.py
as the eager-baseline denominator (BASELINE.md north-star: >=5x this).

Usage: python tools/measure_reference_baseline.py [--reference /root/reference]
"""

import argparse
import sys
import time

import torch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--batch", type=int, default=32, help="pre-CFG batch")
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    sys.path.insert(0, args.reference)
    from diffusion import create_diffusion
    from src.models import DIT_MODELS

    torch.manual_seed(0)
    model = DIT_MODELS["DiT-S/2"](in_channels=4, input_size=16, num_classes=1000)
    model.eval()

    diffusion = create_diffusion("250")
    n = args.batch
    z = torch.randn(2 * n, 4, 16, 16)
    y = torch.cat([torch.randint(0, 1000, (n,)), torch.full((n,), 1000)])
    model_kwargs = dict(y=y, cfg_scale=1.5)

    with torch.no_grad():
        # warmup one step
        t = torch.full((2 * n,), 249, dtype=torch.long)
        diffusion.p_sample(model.forward_with_cfg, z, t, clip_denoised=False, model_kwargs=model_kwargs)

        start = time.time()
        x = z
        for i in range(args.steps):
            t = torch.full((2 * n,), 249 - i, dtype=torch.long)
            x = diffusion.p_sample(
                model.forward_with_cfg, x, t, clip_denoised=False, model_kwargs=model_kwargs
            )["sample"]
        elapsed = time.time() - start

    print(f"batch={n} (x2 CFG), steps={args.steps}, elapsed={elapsed:.2f}s")
    print(f"denoise_steps_per_sec={args.steps / elapsed:.4f}")


if __name__ == "__main__":
    main()
