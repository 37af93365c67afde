#!/usr/bin/env python
"""Sample a grid of images from a trained run (reference sample.py parity).

Loads config.yaml from the experiment dir, reconstructs the post-hoc EMA at
--ema-std (or a specific checkpoint via --ckpt), runs the full 250-step
respaced DDPM chain with batched CFG as ONE jitted scan, denormalizes by the
dataset stats, optionally decodes through the SD-VAE (JAX port, local
weights), and writes a PNG grid.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.runtime import build_sample_fn
from mapdit_tpu.training.ema import calculate_posthoc_ema
from mapdit_tpu.utils import class_name, load_config
from mapdit_tpu.utils.experiment import config_from_args, percentile_arg
from mapdit_tpu.utils.image import save_image_grid
from mapdit_tpu.utils.compile_cache import enable_compile_cache


def _constants_from_torch(path: str, sd_key: str):
    """Extract the Fourier-buffer constants riding inside a reference torch
    state_dict (fp16 in EMA snapshots; cast back to f32)."""
    import jax
    import torch

    from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

    d = torch.load(path, map_location="cpu", weights_only=True)
    sd = d[sd_key] if sd_key in d else d
    constants = variables_from_torch_state_dict(
        {k: np.asarray(v) for k, v in sd.items()}
    )["constants"]
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), constants)


def _load_constants(result_dir: str):
    """Non-trainable constants (MPFourier buffers): constants.msgpack written
    at train start, else from the latest checkpoint, else — for experiment
    dirs migrated from the reference in place — from a torch EMA snapshot or
    checkpoint (the buffers travel inside the reference's state_dicts)."""
    import glob

    from flax import serialization

    path = os.path.join(result_dir, "constants.msgpack")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    from mapdit_tpu.training.checkpoint import latest_checkpoint

    ck = latest_checkpoint(result_dir)
    if ck:
        with open(ck, "rb") as f:
            return serialization.msgpack_restore(f.read())["constants"]
    from mapdit_tpu.training.ema import list_snapshots

    ema_dir = os.path.join(result_dir, "ema")
    if os.path.isdir(ema_dir):
        for _, _, snap in list_snapshots(ema_dir):
            if snap.endswith(".pt"):
                return _constants_from_torch(snap, "state_dict")
    for pt in sorted(glob.glob(os.path.join(result_dir, "checkpoints", "*.pt"))):
        return _constants_from_torch(pt, "model")
    raise SystemExit(
        "error: need constants.msgpack, a checkpoint, or a reference torch "
        f"EMA ledger in {result_dir}"
    )


def load_variables(result_dir: str, train_args: dict, ckpt=None, ema_std=0.05):
    """EMA-reconstructed (default) or raw-checkpoint variables
    (reference sample.py:27-34). `--ckpt` accepts both this framework's
    msgpack checkpoints and the reference's torch .pt checkpoints
    ({"model": state_dict}) via the torch-import mapping."""
    from flax import serialization

    if ckpt is not None:
        pt = os.path.join(result_dir, "checkpoints", f"{ckpt}.pt")
        if os.path.exists(pt):
            import torch

            from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

            sd = torch.load(pt, map_location="cpu", weights_only=True)["model"]
            return variables_from_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}
            )
        path = os.path.join(result_dir, "checkpoints", f"{ckpt}.msgpack")
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        return {"params": state["params"], "constants": state["constants"]}

    params = calculate_posthoc_ema(ema_std, os.path.join(result_dir, "ema"))
    return {"params": params, "constants": _load_constants(result_dir)}


def decode_latents(
    samples: np.ndarray, train_args: dict, use_vae: bool, vae_path=None,
    decoder=None, clip: bool = True,
):
    """Denormalize by dataset stats and optionally decode through the VAE.

    ``decoder`` short-circuits the weight load — long-lived callers
    (serve.py) pass the decoder they built once at startup.

    ``clip`` clamps to the [-1, 1] image range — correct for every image
    output path (PNG grids, FID uint8 npz; decoded pixels live there by
    construction). Pass ``clip=False`` when the caller consumes RAW
    latents as numbers (tools/distribution_probe.py): denormalized
    latents are NOT range-bounded, and clipping them silently truncates
    any law with mass outside the box (it cost a session a wrong
    model-shrinkage diagnosis on a |mean|~2 probe law — BENCH_NOTES
    r03s9 'clip artifact')."""
    mean = np.asarray(train_args["stats_mean"], np.float32).reshape(1, -1, 1, 1)
    std = np.asarray(train_args["stats_std"], np.float32).reshape(1, -1, 1, 1)
    samples = samples * std + mean
    if use_vae:
        if decoder is None:
            from mapdit_tpu.models.vae import load_decoder

            decoder = load_decoder(vae_path)
        if decoder is None:
            print("warning: no VAE weights available (--vae-path); writing raw latents")
        else:
            samples = np.asarray(decoder(jnp.asarray(samples)))
    return np.clip(samples, -1.0, 1.0) if clip else samples


def main(args):
    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(label="sample")
    cfg_path = os.path.join(args.result_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise SystemExit(
            f"error: {cfg_path} not found — --result-dir must point at an "
            "experiment directory created by train.py"
        )
    train_args = load_config(args.result_dir)
    cfg = config_from_args(train_args)
    variables = load_variables(args.result_dir, train_args, args.ckpt, args.ema_std)

    n = 4
    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    key, zkey, skey = jax.random.split(key, 3)
    z = jax.random.normal(
        zkey, (n, train_args["in_channels"], train_args["input_size"], train_args["input_size"])
    )
    # CFG batch: [z; z] with [labels; null] (reference sample.py:46-48)
    z = jnp.concatenate([z, z], axis=0)
    y = jnp.concatenate(
        [jnp.full((n,), args.class_label, jnp.int32),
         jnp.full((n,), cfg.num_classes, jnp.int32)]
    )

    steps = args.num_sampling_steps
    if train_args.get("distill_rounds"):
        # Distilled student (distill.py): the checkpoint is only valid on
        # its own nested DDIM grid — rebuild it from the config and pin the
        # protocol (deterministic DDIM; guidance already baked if the run
        # used --cfg-scale > 1, so CFG re-application would compound it).
        from mapdit_tpu.diffusion.distill import student_diffusion_from_config

        diffusion = student_diffusion_from_config(train_args)
        steps = diffusion.num_timesteps
        if args.sampler != "ddim" or args.num_sampling_steps != steps:
            print(
                f"distilled student: forcing --sampler ddim at its "
                f"{steps}-step grid (requested {args.sampler}/"
                f"{args.num_sampling_steps})"
            )
            args.sampler = "ddim"
        if train_args.get("distill_cfg_scale", 1.0) > 1.0 and args.cfg_scale != 1.0:
            print(
                f"distilled student: guidance baked at scale "
                f"{train_args['distill_cfg_scale']}; forcing --cfg-scale 1"
            )
            args.cfg_scale = 1.0
        assert args.cache_interval <= 1 and args.cfg_interval is None and (
            not args.save_trajectory
        ), "--cache-interval/--cfg-interval/--save-trajectory do not apply to distilled students"
    else:
        from mapdit_tpu.diffusion import respacing_string

        diffusion = create_diffusion(respacing_string(steps, args.sampler, args.time_schedule))
    if args.cache_interval > 1:
        # Delta-DiT block-span caching: LOSSY accelerator (ddpm and dpm++;
        # stacks with --time-schedule karras) — measured deviation numbers
        # in docs/BENCH_NOTES.md
        assert args.sampler in ("ddpm", "dpm++"), (
            "--cache-interval composes with --sampler ddpm or dpm++"
        )
        from mapdit_tpu.runtime import build_cached_sample_fn

        sample_fn = build_cached_sample_fn(
            cfg, variables, diffusion, cfg_scale=args.cfg_scale,
            cache_interval=args.cache_interval, sampler=args.sampler,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            cache_mode=args.cache_mode, clip_denoised=args.clip_denoised,
            dynamic_threshold=args.dynamic_threshold,
        )
    else:
        sample_fn = build_sample_fn(
            cfg, variables, diffusion, cfg_scale=args.cfg_scale,
            sampler=args.sampler, eta=args.eta,
            cfg_interval=tuple(args.cfg_interval) if args.cfg_interval else None,
            clip_denoised=args.clip_denoised, batch_hint=n,
            dynamic_threshold=args.dynamic_threshold,
        )
    samples = sample_fn(z, y, skey)
    samples = np.asarray(samples[:n])  # drop the null-class half

    samples = decode_latents(samples, train_args, args.use_vae, args.vae_path)
    save_image_grid(samples, args.output_file, nrow=2)
    print(f"output class: {class_name(args.class_label)} ({args.class_label})")

    if args.save_trajectory:
        # Denoising-evolution grid via the progressive scan (the reference's
        # p_sample_loop_progressive generator API, `gd.py:464-511`, which
        # neither codebase otherwise wires to a CLI): one row per sample,
        # columns = pred_xstart at ~8 evenly spaced chain positions.
        assert args.sampler == "ddpm", "--save-trajectory needs --sampler ddpm"
        assert args.cfg_interval is None, (
            "--save-trajectory renders the full-CFG progressive chain; it "
            "does not depict the --cfg-interval segmented chain"
        )
        from mapdit_tpu.runtime import build_model_fn

        model_fn = build_model_fn(cfg, variables, cfg_scale=args.cfg_scale)
        frames_t = np.linspace(0, steps - 1, min(8, steps)).round().astype(int)

        # Gather the ~8 kept frames (conditioned half only) INSIDE the jitted
        # program: only (n, F, C, H, W) ever crosses to the host instead of
        # the full (T, 2n, C, H, W) stack.
        @jax.jit
        def traj_fn(z, y, k):
            outs = diffusion.p_sample_loop_progressive(
                model_fn, z, k, clip_denoised=args.clip_denoised,
                model_kwargs={"y": y},
            )
            return outs["pred_xstart"][jnp.asarray(frames_t)][:, :n]

        traj = np.asarray(traj_fn(z, y, skey))  # (F, n, C, H, W)
        traj = np.swapaxes(traj, 0, 1)
        n_frames = traj.shape[1]
        traj = traj.reshape(n * n_frames, *traj.shape[2:])
        traj = decode_latents(traj, train_args, args.use_vae, args.vae_path)
        save_image_grid(traj, args.save_trajectory, nrow=n_frames)
        print(f"trajectory grid ({n_frames} frames/sample): {args.save_trajectory}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--use-vae", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL")
    parser.add_argument("--vae-path", type=str, default=None,
                        help="local SD-VAE weights (safetensors/pt); offline replacement "
                             "for the reference's hub download")
    parser.add_argument("--output-file", type=str, default="sample.png")
    parser.add_argument("--class-label", type=int, default=88)
    parser.add_argument("--cfg-scale", type=float, default=4.0)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "dpm++", "unipc"], default="ddpm")
    parser.add_argument("--time-schedule", choices=["uniform", "karras"], default="uniform",
                        help="timestep grid: uniform sections (reference) or the "
                             "EDM rho-7 sigma spacing (better at low step counts)")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic ODE, 1 = DDPM-like)")
    parser.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                        metavar=("SIGMA_LO", "SIGMA_HI"),
                        help="limited-interval guidance (arXiv 2404.07724): apply "
                             "CFG only on steps whose noise level sigma(t) lies in "
                             "[LO, HI]; other steps run the cond-only model at half "
                             "the batch. Improves FID at high cfg-scale and cuts "
                             "FLOPs; ddpm/dpm++ only. Paper's ImageNet-512 EDM2 "
                             "pick was [0.28, 2.90]; for this 1000-step linear "
                             "schedule try [0.3, 3.0]")
    parser.add_argument("--cache-interval", type=int, default=0,
                        help="Delta-DiT block-span caching every N steps "
                             "(0 = exact chain; lossy — see BENCH_NOTES)")
    parser.add_argument("--cache-mode", choices=["hold", "forecast"], default="forecast",
                        help="skip-step span delta: hold it constant (Delta-DiT) "
                             "or linearly extrapolate from the last two full "
                             "evaluations (static Predict-to-Skip, arXiv "
                             "2602.18093; same FLOPs — BENCH_NOTES records "
                             "measured deviations)")
    parser.add_argument("--dynamic-threshold", type=percentile_arg, default=None,
                        metavar="P",
                        help="Imagen-style dynamic thresholding (arXiv "
                             "2205.11487): clip each sample's x0 estimate to "
                             "its own P-quantile of |x0| (floor 1.0), no "
                             "rescale — stabilizes undertrained or "
                             "high-guidance chains without the bias of "
                             "--clip-denoised's hard [-1,1] clamp")
    parser.add_argument("--save-trajectory", type=str, default=None,
                        help="also write a denoising-evolution grid (pred_xstart "
                             "at 8 chain positions) to this PNG; ddpm only. "
                             "Runs a second full denoising chain (~doubles "
                             "sampling time); only the kept frames leave the "
                             "device")
    parser.add_argument("--clip-denoised", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="clamp pred_xstart to [-1, 1] each step (the "
                             "reference scripts pass False, `sample.py:57`; "
                             "True keeps few-step chains finite on untrained "
                             "or early-training checkpoints)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--ema-std", type=float, default=0.05)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint step to load instead of EMA (no extension)")
    main(parser.parse_args())
