#!/usr/bin/env python
"""Batched class-conditional sampling for FID evaluation
(reference sample_fid.py parity).

Produces a uint8 NHWC ``.npz`` (key ``arr_0``, ADM-evaluator format) of
--num-samples images at 250 respaced DDPM steps. CFG is used only when
--cfg-scale > 1 (reference sample_fid.py:56-66). The whole denoising chain
per batch is one jitted scan; batches reuse the compiled program.
"""

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from mapdit_tpu.parallel import batch_sharding, make_mesh

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.runtime import build_sample_fn
from mapdit_tpu.utils import load_config
from mapdit_tpu.utils.experiment import config_from_args, percentile_arg
from mapdit_tpu.utils.image import to_uint8

from sample import decode_latents, load_variables
from mapdit_tpu.utils.compile_cache import enable_compile_cache


def main(args):
    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(label="sample_fid")
    cfg_path = os.path.join(args.result_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise SystemExit(
            f"error: {cfg_path} not found — --result-dir must point at an "
            "experiment directory created by train.py"
        )
    train_args = load_config(args.result_dir)
    cfg = config_from_args(train_args)
    variables = load_variables(args.result_dir, train_args, args.ckpt, args.ema_std)
    steps = args.num_sampling_steps
    if train_args.get("distill_rounds"):
        # distilled student (distill.py): pin the protocol to its own
        # nested DDIM grid; guidance is baked, so no CFG doubling
        from mapdit_tpu.diffusion.distill import student_diffusion_from_config

        diffusion = student_diffusion_from_config(train_args)
        steps = diffusion.num_timesteps
        if args.sampler != "ddim" or args.cfg_scale > 1.0:
            print(
                f"distilled student: forcing ddim at its {steps}-step grid, "
                "cfg 1 (guidance baked)"
            )
        args.sampler, args.cfg_scale = "ddim", 1.0
        assert args.cfg_interval is None and not args.pit_window, (
            "--cfg-interval/--pit-* do not apply to distilled students"
        )
    else:
        from mapdit_tpu.diffusion import respacing_string

        diffusion = create_diffusion(
            respacing_string(steps, args.sampler, args.time_schedule)
        )

    use_cfg = args.cfg_scale > 1.0

    # Data-parallel sampling over all available chips. Two layouts:
    #   * gspmd (single-chip default): GSPMD replicates params and splits
    #     the scan batch — but it has no partitioning rule for the Pallas
    #     megakernel custom-calls, so the `auto` kernel gate falls back to
    #     the XLA pipeline on multi-device meshes.
    #   * shard_map (multi-chip default): the whole single-chip chain runs
    #     inside jax.shard_map per data shard — megakernels stay live (625
    #     vs 409 steps/s/chip at S/2), CFG pairs never straddle shards,
    #     chain noise decorrelated via fold_in(key, axis_index). Same math,
    #     different (equally valid) noise stream than the gspmd layout.
    if args.n_model > 1 and args.kernel_sharding == "shard_map":
        raise SystemExit(
            "error: --kernel-sharding shard_map is data-parallel only "
            "(per-shard single-chip programs); tensor parallelism "
            "(--n-model > 1) runs on the gspmd layout"
        )
    mesh = make_mesh(n_model=args.n_model)
    n_data = mesh.shape["data"]
    use_shard_map = args.kernel_sharding == "shard_map" or (
        args.kernel_sharding == "auto" and n_data > 1 and args.n_model == 1
    )
    n = args.batch_size
    if args.pit_window:
        from mapdit_tpu.runtime import build_pit_sample_fn

        if args.sampler != "ddim" or args.eta != 0.0:
            raise SystemExit(
                "error: --pit-window needs --sampler ddim --eta 0 (the "
                "deterministic map block-Picard iterates on)"
            )
        if args.cfg_interval or args.kernel_sharding == "shard_map":
            raise SystemExit(
                "error: --pit-window composes with the gspmd layout only "
                "(no cfg-interval/shard_map)"
            )
        sample_fn = build_pit_sample_fn(
            cfg, variables, diffusion,
            cfg_scale=args.cfg_scale if use_cfg else None,
            window=args.pit_window, sweeps=args.pit_sweeps,
            shift=args.pit_shift,
            clip_denoised=args.clip_denoised,
            dynamic_threshold=args.dynamic_threshold,
            mesh=mesh if mesh.devices.size > 1 else None,
        )
        use_shard_map = False
    elif use_shard_map:
        from mapdit_tpu.runtime import build_dp_sharded_sample_fn

        assert n % n_data == 0, \
            "batch size must divide the device count (per-shard CFG doubling)"
        sample_fn = build_dp_sharded_sample_fn(
            cfg, variables, diffusion, mesh,
            cfg_scale=args.cfg_scale if use_cfg else None,
            sampler=args.sampler,
            eta=args.eta,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            clip_denoised=args.clip_denoised, batch_hint=args.batch_size,
            dynamic_threshold=args.dynamic_threshold,
        )
    else:
        sample_fn = build_sample_fn(
            cfg, variables, diffusion,
            cfg_scale=args.cfg_scale if use_cfg else None,
            sampler=args.sampler,
            eta=args.eta,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            clip_denoised=args.clip_denoised, batch_hint=args.batch_size,
            dynamic_threshold=args.dynamic_threshold,
            mesh=mesh if mesh.devices.size > 1 else None,
        )
        assert (2 * n if use_cfg else n) % n_data == 0, \
            "batch size (incl. CFG doubling) must divide the data axis"
    if args.pit_window:
        # pit shards the window rows internally (sharding constraint in the
        # sweep); the batch itself need not divide the data axis
        from mapdit_tpu.parallel import replicated

        b_shard = replicated(mesh)
    else:
        b_shard = batch_sharding(mesh)

    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    gathered = []
    for _ in tqdm(range(math.ceil(args.num_samples / n))):
        key, zkey, ykey, skey = jax.random.split(key, 4)
        z = jax.random.normal(
            zkey, (n, train_args["in_channels"], train_args["input_size"], train_args["input_size"])
        )
        y = jax.random.randint(ykey, (n,), 0, args.num_classes)
        if not use_shard_map and use_cfg:
            z = jnp.concatenate([z, z], axis=0)
            y = jnp.concatenate([y, jnp.full((n,), args.num_classes, jnp.int32)])
        z = jax.device_put(z, b_shard)
        y = jax.device_put(y, b_shard)
        with jax.set_mesh(mesh):
            samples = sample_fn(z, y, skey)
        samples = np.asarray(samples[:n])
        samples = decode_latents(samples, train_args, args.use_vae, args.vae_path)
        gathered.append(to_uint8(samples))

    samples = np.concatenate(gathered, axis=0)[: args.num_samples]
    out_dir = os.path.join(args.result_dir, "fid_samples")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, args.output_file), arr_0=samples)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--use-vae", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--cfg-scale", type=float, default=1.5)
    parser.add_argument("--num-classes", type=int, default=1_000)
    parser.add_argument("--num-samples", type=int, default=10_000)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "dpm++", "unipc"], default="ddpm")
    parser.add_argument("--time-schedule", choices=["uniform", "karras"], default="uniform",
                        help="timestep grid: uniform sections (reference) or EDM sigma spacing")
    parser.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                        metavar=("SIGMA_LO", "SIGMA_HI"),
                        help="limited-interval guidance (arXiv 2404.07724): CFG "
                             "only where sigma(t) is inside [LO, HI]; improves "
                             "FID at high guidance and cuts FLOPs (see sample.py)")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic ODE)")
    parser.add_argument("--clip-denoised", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="clamp pred_xstart to [-1, 1] each step (reference "
                             "FID protocol passes False; True keeps few-step "
                             "chains finite on untrained checkpoints)")
    parser.add_argument("--dynamic-threshold", type=percentile_arg, default=None,
                        metavar="P",
                        help="Imagen-style dynamic thresholding (arXiv "
                             "2205.11487): per-sample P-quantile x0 clip, "
                             "floor 1.0, no rescale (see sample.py)")
    parser.add_argument("--pit-window", type=int, default=0,
                        help="parallel-in-time sampling (block-Picard, "
                             "ParaDiGMS-family arXiv 2305.16317): solve the "
                             "ddim chain in windows of this many steps, all "
                             "positions evaluated in ONE batched model call "
                             "per sweep, window rows sharded over the 'data' "
                             "axis — multi-chip single-sample latency "
                             "(~window/sweeps lower sequential depth at "
                             "sweeps x the FLOPs). Must divide the step "
                             "count; 0 = off. ddim eta=0 only")
    parser.add_argument("--pit-sweeps", type=int, default=2,
                        help="block schedule: Picard sweeps per window; == "
                             "window is EXACT (bit-tight vs the sequential "
                             "chain), fewer is the accelerated lossy regime "
                             "— arbitrate like any accelerator")
    parser.add_argument("--pit-shift", type=int, default=None,
                        help="SLIDING schedule instead (closer to ParaDiGMS; "
                             "measured better than block at matched cost): "
                             "accept this many positions per sweep — "
                             "sequential depth T/shift at (window/shift) x "
                             "FLOPs; shift=1 is exact. Overrides --pit-sweeps")
    parser.add_argument("--n-model", type=int, default=1,
                        help="tensor-parallel width: devices reshape to a "
                             "(data, model) mesh and every model call in the "
                             "chain splits its QKV/MLP matmuls over the "
                             "'model' axis (training TP layout, GSPMD psums "
                             "over ICI). Use when per-chip batch is too small "
                             "to fill the data axis — the latency layout; "
                             "pure DP (default) is the throughput layout")
    parser.add_argument("--kernel-sharding", choices=["auto", "gspmd", "shard_map"],
                        default="auto",
                        help="multi-chip layout: gspmd = batch-sharded one "
                             "program (XLA pipeline only — GSPMD cannot "
                             "partition the Pallas megakernels); shard_map = "
                             "per-shard single-chip programs (megakernels "
                             "live, per-shard fold_in noise). auto = "
                             "shard_map when >1 device, else gspmd")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-file", type=str, default="samples.npz")
    parser.add_argument("--ema-std", type=float, default=0.05)
    parser.add_argument("--ckpt", type=str, default=None)
    main(parser.parse_args())
