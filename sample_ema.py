#!/usr/bin/env python
"""Compare post-hoc EMA stds side by side (reference sample_ema.py parity).

Reconstructs the model at five EMA stds, samples 8 images per std with the
same seed/noise, and writes one grid with a row per image and a column per
std.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.runtime import build_shared_sample_fn
from mapdit_tpu.utils import class_name, load_config
from mapdit_tpu.utils.experiment import config_from_args, percentile_arg
from mapdit_tpu.utils.image import save_image_grid

from sample import decode_latents, load_variables
from mapdit_tpu.utils.compile_cache import enable_compile_cache

EMA_STDS = [0.0075, 0.01, 0.05, 0.1, 0.15]  # reference sample_ema.py:25


def main(args):
    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(label="sample_ema")
    cfg_path = os.path.join(args.result_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise SystemExit(
            f"error: {cfg_path} not found — --result-dir must point at an "
            "experiment directory created by train.py"
        )
    train_args = load_config(args.result_dir)
    cfg = config_from_args(train_args)
    steps = args.num_sampling_steps
    from mapdit_tpu.diffusion import respacing_string

    diffusion = create_diffusion(respacing_string(steps, args.sampler, args.time_schedule))

    n = 8
    # One compiled sampler shared across all five EMA parameter sets.
    prepare, sample_fn = build_shared_sample_fn(
        cfg, diffusion, cfg_scale=args.cfg_scale, sampler=args.sampler, eta=args.eta,
        cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
        dynamic_threshold=args.dynamic_threshold,
        batch_hint=n,
    )
    res = []
    for std in EMA_STDS:
        variables = prepare(load_variables(args.result_dir, train_args, None, std))
        key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
        key, zkey, skey = jax.random.split(key, 3)
        z = jax.random.normal(
            zkey,
            (n, train_args["in_channels"], train_args["input_size"], train_args["input_size"]),
        )
        z = jnp.concatenate([z, z], axis=0)
        y = jnp.concatenate(
            [jnp.full((n,), args.class_label, jnp.int32),
             jnp.full((n,), cfg.num_classes, jnp.int32)]
        )
        res.append(np.asarray(sample_fn(variables, z, y, skey)[:n]))

    # (n, stds, C, H, W) -> row-major grid with one column per std
    samples = np.stack(res, axis=1).reshape(-1, *res[0].shape[1:])
    samples = decode_latents(samples, train_args, args.use_vae, args.vae_path)
    save_image_grid(samples, args.output_file, nrow=len(EMA_STDS))
    print(f"output class: {class_name(args.class_label)} ({args.class_label})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--use-vae", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--output-file", type=str, default="sample.png")
    parser.add_argument("--class-label", type=int, default=88)
    parser.add_argument("--cfg-scale", type=float, default=4.0)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "dpm++", "unipc"], default="ddpm")
    parser.add_argument("--time-schedule", choices=["uniform", "karras"], default="uniform",
                        help="timestep grid: uniform sections (reference) or EDM sigma spacing")
    parser.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                        metavar=("SIGMA_LO", "SIGMA_HI"),
                        help="limited-interval guidance (arXiv 2404.07724; "
                             "see sample.py --cfg-interval)")
    parser.add_argument("--dynamic-threshold", type=percentile_arg, default=None,
                        metavar="P",
                        help="Imagen-style dynamic thresholding (arXiv "
                             "2205.11487) — stabilizes undertrained chains, "
                             "exactly the EMA-sweep use case (see sample.py)")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic ODE)")
    parser.add_argument("--seed", type=int, default=42)
    main(parser.parse_args())
