#!/usr/bin/env python
"""Progressively distill a trained DiT to few-step DDIM sampling.

Beyond-reference capability (the reference's few-step story stops at
timestep respacing, `/root/reference/diffusion/respace.py:12-62`): each
stage trains a student — initialized from the teacher — whose ONE DDIM step
reproduces TWO teacher DDIM steps (Salimans & Ho, arXiv 2202.00512), with
optional classifier-free guidance BAKED IN at a fixed scale on the first
stage (Meng et al., arXiv 2210.03142) so the distilled model samples
conditionally without CFG batch doubling.

    python distill.py --teacher <exp_dir> --data-path <latents> \
        --results-dir <dir> --base-steps 64 --stages 4 \
        --steps-per-stage 2000 --cfg-scale 1.5

writes one experiment directory per stage (config.yaml + checkpoint +
constants + EMA snapshot — the standard layout), each directly consumable by
sample.py / sample_fid.py / serve.py / tools/distribution_probe.py: the
``distill_*`` config fields make those scripts rebuild the student's exact
timestep grid and default to the DDIM chain at cfg 1.

Each stage's whole step — two frozen teacher DDIM calls, student forward,
backward, Adam, forced-WN projection, power-EMA — is one donated jitted XLA
program, data-parallel over the device mesh like train.py's.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp

from mapdit_tpu.diffusion.distill import (
    base_timestep_map,
    diffusion_from_map,
    halved_map,
    make_distill_losses,
    make_teacher_fn,
)
from mapdit_tpu.models.dit import DiT
from mapdit_tpu.parallel import batch_sharding, make_mesh, replicated
from mapdit_tpu.training import (
    EMA_STDS,
    create_optimizer,
    create_train_state,
    ema_key,
    make_train_step,
    warmup_flat_invsqrt,
)
from mapdit_tpu.training import ema as ema_lib
from mapdit_tpu.training.checkpoint import save_state
from mapdit_tpu.training.data import LatentDataset, SyntheticLatentDataset
from mapdit_tpu.training.lr import default_schedule_steps
from mapdit_tpu.utils import create_logger, load_config, save_config
from mapdit_tpu.utils.compile_cache import enable_compile_cache
from mapdit_tpu.utils.experiment import config_from_args


def build_dataset(data_path: str):
    if data_path.startswith("synthetic"):
        n = int(data_path.split(":")[1]) if ":" in data_path else 1024
        return SyntheticLatentDataset(num_examples=n)
    return LatentDataset(data_path)


def main(args):
    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(label="distill")

    teacher_args = load_config(args.teacher)
    if args.compute_dtype:
        teacher_args = dict(teacher_args, compute_dtype=args.compute_dtype)
    cfg = config_from_args(teacher_args)
    if cfg.block_kernel in ("mega_attn_tp", "mega_tp"):
        # inference-only TP island (no VJP): distillation trains the
        # student, so fall back to auto kernel resolution
        cfg = cfg.replace(block_kernel="auto")
    model = DiT(cfg)

    from sample import load_variables

    variables = load_variables(
        args.teacher, teacher_args, args.teacher_ckpt, args.teacher_ema
    )
    teacher_params = variables["params"]
    constants = variables.get("constants", {})

    os.makedirs(args.results_dir, exist_ok=True)
    logger = create_logger(None, verbose=1)

    dataset = build_dataset(args.data_path)
    assert dataset.channels == teacher_args["in_channels"], (
        "distill data must live in the teacher's latent space"
    )
    assert dataset.data_size == teacher_args["input_size"]
    # Normalize with the TEACHER's training stats (config.yaml), not the
    # distill dataset's own — the teacher's input space is the contract.
    stats_mean = jnp.asarray(teacher_args["stats_mean"])
    stats_std = jnp.asarray(teacher_args["stats_std"])

    mesh = make_mesh(n_model=1)
    b_shard = batch_sharding(mesh)
    assert args.batch_size % mesh.shape["data"] == 0

    if teacher_args.get("distill_rounds"):
        # Chained distillation (teacher is itself a distilled student): the
        # teacher's OWN nested grid is the stage-0 map. A fresh
        # uniform/karras subset of the same length would silently mis-span
        # the teacher's steps (the nested-subset invariant in
        # mapdit_tpu/diffusion/distill.py's module docstring).
        from mapdit_tpu.diffusion.distill import distilled_map

        base_steps0 = int(teacher_args["distill_base_steps"])
        rounds0 = int(teacher_args["distill_rounds"])
        base_schedule0 = teacher_args.get("distill_base_schedule", "uniform")
        if float(teacher_args.get("distill_cfg_scale", 1.0)) > 1.0 and args.cfg_scale != 1.0:
            # A second bake would compound guidance in the weights while the
            # recorded distill_cfg_scale can only carry one number — the
            # lineage would misstate effective guidance (ADVICE r03).
            raise SystemExit(
                f"teacher already baked cfg_scale "
                f"{teacher_args['distill_cfg_scale']}; guidance is baked "
                "exactly once — rerun with --cfg-scale 1.0 (the baked scale "
                "stays in effect)"
            )
        if args.base_schedule != base_schedule0:
            logger.warning(
                f"--base-schedule {args.base_schedule} ignored: chained "
                f"distillation continues the teacher's recorded "
                f"{base_schedule0} grid"
            )
        m = distilled_map(base_steps0, rounds0, base_schedule0)
        if args.base_steps != len(m):
            raise SystemExit(
                f"--base-steps {args.base_steps} != the distilled teacher's "
                f"grid ({len(m)} steps: {base_steps0} halved {rounds0}x); "
                "chained distillation continues the teacher's own grid"
            )
    else:
        base_steps0, rounds0, base_schedule0 = (
            args.base_steps, 0, args.base_schedule,
        )
        m = base_timestep_map(args.base_steps, args.base_schedule)
    ema_stds = tuple(args.ema_stds)
    exp_index = len(os.listdir(args.results_dir))
    stage_dirs = []

    with jax.set_mesh(mesh):
        for stage in range(1, args.stages + 1):
            m_s = halved_map(m)
            d_teacher = diffusion_from_map(m)
            d_student = diffusion_from_map(m_s)
            # Guidance is baked exactly once (stage 1); later stages distill
            # the already-guided student at scale 1.
            stage_cfg_scale = args.cfg_scale if stage == 1 else 1.0

            warmup, decay = default_schedule_steps(args.steps_per_stage)
            tx = create_optimizer(warmup_flat_invsqrt(args.lr, warmup, decay))
            state = create_train_state(cfg, tx, seed=args.seed, ema_stds=ema_stds)
            copy = lambda tree: jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), tree
            )
            state = state.replace(
                params=copy(teacher_params),
                constants=constants,
                ema={ema_key(s): copy(teacher_params) for s in ema_stds},
            )
            def step_with_teacher(state, batch, t_params):
                # Teacher params enter as a jit ARGUMENT: closing over them
                # would embed ~all model weights as HLO constants (XLA then
                # constant-folds over them — slow compiles, duplicated HBM).
                teacher_fn = make_teacher_fn(
                    model, t_params, constants, cfg.num_classes,
                    cfg_scale=stage_cfg_scale,
                )
                inner = make_train_step(
                    cfg, d_student, tx,
                    stats_mean=stats_mean, stats_std=stats_std,
                    ema_stds=ema_stds,
                    losses_fn=make_distill_losses(d_teacher, d_student, teacher_fn),
                    # No CFG label dropout during distillation: the teacher
                    # target sees the true label, so a dropped student label
                    # would corrupt the pairing (see make_train_step doc).
                    model_train=False,
                )
                return inner(state, batch)

            step_fn = jax.jit(step_with_teacher, donate_argnums=0)
            teacher_dev = jax.device_put(teacher_params, replicated(mesh))

            batches = dataset.batches(batch_size=args.batch_size, seed=args.seed + stage)
            logger.info(
                f"[stage {stage}/{args.stages}] {len(m)} -> {len(m_s)} steps, "
                f"cfg_scale {stage_cfg_scale}, {args.steps_per_stage} updates"
            )
            loss_buf, t0, logged = [], time.time(), 0
            for it in range(1, args.steps_per_stage + 1):
                batch = {k: jax.device_put(v, b_shard) for k, v in next(batches).items()}
                state, metrics = step_fn(state, batch, teacher_dev)
                loss_buf.append(metrics["loss"])
                logged += 1
                if it % args.log_every == 0 or it == args.steps_per_stage:
                    avg = float(jnp.mean(jnp.stack(loss_buf)))
                    sps = logged / (time.time() - t0)
                    logger.info(
                        f"[stage {stage}] step {it:06d} distill loss {avg:.5f} "
                        f"({sps:.2f} steps/s)"
                    )
                    loss_buf, t0, logged = [], time.time(), 0

            stage_dir = os.path.join(
                args.results_dir,
                f"{exp_index:03d}-{teacher_args['model'].replace('/', '-')}"
                f"-distill{len(m_s)}",
            )
            exp_index += 1
            os.makedirs(os.path.join(stage_dir, "checkpoints"), exist_ok=True)
            stage_args = dict(teacher_args)
            stage_args.update(
                results_dir=args.results_dir,
                distill_base_steps=base_steps0,
                distill_base_schedule=base_schedule0,
                distill_rounds=rounds0 + stage,
                # Guidance composes across chained runs: a scale baked by a
                # distilled teacher stays in effect when this run adds none.
                distill_cfg_scale=(
                    float(teacher_args.get("distill_cfg_scale", 1.0))
                    if args.cfg_scale == 1.0
                    else float(args.cfg_scale)
                ),
                distill_teacher=os.path.abspath(args.teacher),
                distill_num_steps=len(m_s),
            )
            save_config(stage_dir, stage_args)
            from flax import serialization as _ser

            with open(os.path.join(stage_dir, "constants.msgpack"), "wb") as f:
                f.write(_ser.to_bytes(jax.device_get(constants)))
            save_state(stage_dir, args.steps_per_stage, state)
            for s in ema_stds:
                ema_lib.save_snapshot(
                    os.path.join(stage_dir, "ema"), s, args.steps_per_stage,
                    jax.device_get(state.ema[ema_key(s)]),
                )
            logger.info(f"[stage {stage}] saved {stage_dir} ({len(m_s)}-step student)")
            stage_dirs.append(stage_dir)

            teacher_params = state.params
            m = m_s

    print("\n".join(stage_dirs))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--teacher", type=str, required=True,
                        help="trained experiment dir (train.py layout)")
    parser.add_argument("--teacher-ckpt", type=str, default=None,
                        help="teacher checkpoint step (default: post-hoc EMA)")
    parser.add_argument("--teacher-ema", type=float, default=0.05,
                        help="post-hoc EMA std for the teacher weights")
    parser.add_argument("--data-path", type=str, required=True,
                        help="latent dataset dir, or 'synthetic[:N]'")
    parser.add_argument("--results-dir", type=str, required=True)
    parser.add_argument("--base-steps", type=int, default=64,
                        help="stage-0 DDIM grid size; must be divisible by "
                             "2**stages (each stage halves it)")
    parser.add_argument("--base-schedule", choices=["uniform", "karras"],
                        default="uniform")
    parser.add_argument("--stages", type=int, default=4,
                        help="number of halvings (64 -> 32 -> 16 -> 8 -> 4)")
    parser.add_argument("--steps-per-stage", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=2e-3,
                        help="per-stage peak LR (reference train LR is 1e-2; "
                             "distillation fine-tunes, so default lower)")
    parser.add_argument("--cfg-scale", type=float, default=1.0,
                        help="bake classifier-free guidance at this fixed "
                             "scale into the stage-1 student (>1 = guided "
                             "distillation; the result samples WITHOUT CFG "
                             "doubling)")
    parser.add_argument("--ema-stds", type=float, nargs="*", default=list(EMA_STDS))
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None, help="override the teacher's compute dtype")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-every", type=int, default=100)
    main(parser.parse_args())
