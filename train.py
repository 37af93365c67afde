#!/usr/bin/env python
"""Train a (MaP-)DiT on VAE-latent data — TPU-native.

CLI parity with the reference's train.py (flags, config.yaml round-trip,
experiment/checkpoint/EMA-snapshot layout, log format) plus the `--use-*`
MaP flag family the reference README documents but never wired up
(README.md:57-66; SURVEY.md fact #1), the `--modulation` paper-ablation
selector, `--resume` (new capability — the reference cannot resume), and
TPU execution knobs (mesh shape, bf16 compute, attention impl).

The entire per-step pipeline — posterior sampling, normalization, loss,
backward, Adam, LR schedule, forced-WN projection, 2x power-EMA lerp — is a
single donated jitted XLA program, data-parallel over the ('data','model')
mesh. The host only shuffles indices and stages (mean, std, label) slices.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import DIT_MODELS, param_count
from mapdit_tpu.parallel import batch_sharding, make_mesh, param_sharding, shard_tree
from mapdit_tpu.training import (
    EMA_STDS,
    create_optimizer,
    create_train_state,
    ema_key,
    make_train_step,
    warmup_flat_invsqrt,
)
from mapdit_tpu.training import ema as ema_lib
from mapdit_tpu.training.checkpoint import (
    latest_checkpoint_any,
    restore_state,
    save_state,
)
from mapdit_tpu.training.data import LatentDataset, SyntheticLatentDataset
from mapdit_tpu.training.lr import default_schedule_steps
from mapdit_tpu.utils import create_logger, save_config, setup_experiment
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

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    def _startup():
        # jax.devices() is only legal AFTER jax.distributed.initialize(),
        # so both run under the one watchdog (a hung coordinator is a hang
        # mode just like a dead tunnel).
        if args.multihost:
            # Multi-host: one process per host, ICI within a slice. Each
            # process feeds its disjoint slice of every global batch (shared
            # shuffle seed, distributed-sampler partition) and only process 0
            # writes logs/checkpoints/snapshots. Cluster auto-detection covers
            # TPU pods; the MAPDIT_* env vars allow explicit bring-up (used by
            # the 2-process CPU test in tests/test_multiprocess.py).
            init_kw = {}
            if os.environ.get("MAPDIT_COORDINATOR"):
                init_kw = dict(
                    coordinator_address=os.environ["MAPDIT_COORDINATOR"],
                    num_processes=int(os.environ["MAPDIT_NUM_PROCESSES"]),
                    process_id=int(os.environ["MAPDIT_PROCESS_ID"]),
                )
            jax.distributed.initialize(**init_kw)
        return jax.devices()

    devices = fail_fast_on_dead_backend(label="train", discover=_startup)
    mesh = make_mesh(n_model=args.n_model)
    n_data = mesh.shape["data"]

    # Only process 0 owns the experiment directory: logs, config.yaml,
    # msgpack checkpoints and EMA snapshots are written once, not per host.
    # The directory PATH is broadcast to every process because the orbax
    # save is a collective all processes must join (shared filesystem).
    is_lead = jax.process_index() == 0
    exp_dir = setup_experiment(args.model, args.results_dir) if is_lead else None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        buf = np.zeros(1024, np.uint8)
        if is_lead:
            enc = exp_dir.encode()
            buf[: len(enc)] = np.frombuffer(enc, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        exp_dir = bytes(buf[buf != 0]).decode()
    logger = create_logger(exp_dir if is_lead else None, verbose=args.verbose if is_lead else 0)
    logger.info(f"devices: {len(devices)}x {devices[0].device_kind}; mesh data={n_data} model={args.n_model}")
    logger.info(f"experiment directory created at {exp_dir}")

    dataset = build_dataset(args.data_path)
    logger.info(
        f"dataset contains {len(dataset):,} data points "
        f"({args.data_path}, {dataset.channels}x{dataset.data_size}x{dataset.data_size})"
    )

    # Persist the full config (argparse + dataset-derived fields) — the
    # model-construction source of truth for all sampling scripts.
    args.in_channels = dataset.channels
    args.input_size = dataset.data_size
    args.stats_std = [float(x) for x in dataset.stats["std"]]
    args.stats_mean = [float(x) for x in dataset.stats["mean"]]
    if is_lead:
        save_config(exp_dir, vars(args))

    diffusion = create_diffusion(timestep_respacing="")
    cfg = config_from_args(vars(args))
    if cfg.block_kernel in ("mega_attn_tp", "mega_tp"):
        # inference-only islands (no VJP on the partial kernels, need an
        # ambient mesh) — fail at setup, not mid-trace inside DiTBlock
        raise SystemExit(
            f"--block-kernel {cfg.block_kernel} is an inference-only TP "
            "layout; training uses the XLA path (leave --block-kernel auto)"
        )

    if args.ema_snapshot_every is None:
        args.ema_snapshot_every = args.num_steps // 250
    num_lin_warmup, start_decay = default_schedule_steps(
        args.num_steps, args.num_lin_warmup, args.start_decay
    )

    schedule = warmup_flat_invsqrt(args.lr, num_lin_warmup, start_decay)
    tx = create_optimizer(schedule, grad_clip=args.grad_clip)
    ema_stds = tuple(args.ema_stds)
    state = create_train_state(
        cfg, tx, seed=args.seed, ema_stds=ema_stds,
        timestep_sampler=args.timestep_sampler,
        num_timesteps=diffusion.num_timesteps,
    )
    logger.info(f"model parameters: {param_count(state.params):,}")

    if args.resume:
        path = (
            args.resume
            if os.path.isfile(args.resume) or args.resume.endswith(".orbax")
            else latest_checkpoint_any(args.resume)
        )
        assert path, f"--resume: no checkpoint found at {args.resume}"
        state = restore_state(path, state)
        logger.info(f"resumed from {path} at step {int(state.step)}")

    # Persist non-trainable constants (MPFourier buffers) once — sampling
    # from EMA snapshots alone must not depend on a full checkpoint existing.
    if is_lead:
        from flax import serialization as _ser

        with open(os.path.join(exp_dir, "constants.msgpack"), "wb") as f:
            f.write(_ser.to_bytes(jax.device_get(state.constants)))

    # Lay out state/batch over the mesh (GSPMD inserts grad psum + TP collectives;
    # with --fsdp, per-layer all-gathers + gradient reduce-scatters).
    p_shard = param_sharding(state.params, mesh, fsdp=args.fsdp)
    step_fn = make_train_step(
        cfg,
        diffusion,
        tx,
        stats_mean=jnp.asarray(dataset.stats["mean"]),
        stats_std=jnp.asarray(dataset.stats["std"]),
        ema_stds=ema_stds,
        timestep_sampler=args.timestep_sampler,
        grad_accum=args.grad_accum,
        # pin accumulated grads to the param layout inside the micro scan —
        # without it GSPMD full-remats the backward-dot outputs at the scan
        # carry every iteration (see make_train_step docstring)
        grad_shardings=p_shard if args.grad_accum > 1 and mesh.size > 1 else None,
    )
    step_fn = jax.jit(step_fn, donate_argnums=0)

    mag_probe = None
    if args.log_magnitudes:
        # Magnitude-preservation telemetry (training/telemetry.py): the
        # framework's core invariant as a live metric. Runs on every process
        # (ordinary GSPMD programs over the sharded state); the lead writes.
        from mapdit_tpu.training.telemetry import (
            make_activation_probe,
            weight_magnitudes,
        )

        _w_mags = jax.jit(weight_magnitudes)
        _act_probe = jax.jit(
            make_activation_probe(
                cfg,
                diffusion,
                stats_mean=jnp.asarray(dataset.stats["mean"]),
                stats_std=jnp.asarray(dataset.stats["std"]),
            )
        )

        def mag_probe(st, probe_batch, step):
            row = {k: float(v) for k, v in _w_mags(st.params).items()}
            act = _act_probe(
                st.params, st.constants, probe_batch, jax.random.PRNGKey(step)
            )
            row["block_rms"] = [round(float(v), 4) for v in act["block_rms"]]
            row["out_rms"] = round(float(act["out_rms"]), 4)
            return row
    state = state.replace(
        params=shard_tree(state.params, p_shard),
        ema={k: shard_tree(v, p_shard) for k, v in state.ema.items()},
    )
    if args.fsdp:
        # Adam mu/nu mirror the param tree, so the same rule co-shards them.
        state = state.replace(
            opt_state=shard_tree(
                state.opt_state, param_sharding(state.opt_state, mesh, fsdp=True)
            )
        )
        if jax.process_count() > 1:
            assert args.checkpointer == "orbax", (
                "--fsdp on a multi-host cluster requires --checkpointer orbax "
                "(msgpack saves device_get the full state, which one process "
                "cannot address when shards span hosts; orbax saves are "
                "collective and shard-aware)"
            )
    b_shard = batch_sharding(mesh)

    def gather_replicated(tree):
        """Collective re-replication of a cross-process-sharded pytree so the
        lead process can materialize it host-side (EMA snapshots under
        multihost FSDP). Every process must execute this."""
        from mapdit_tpu.parallel import replicated

        return jax.device_get(
            jax.jit(lambda t: t, out_shardings=replicated(mesh))(tree)
        )

    # --batch-size is the GLOBAL batch. Every process draws the same epoch
    # permutation (shared seed) and feeds its disjoint batch_size/process_count
    # row slice of each global batch; make_array_from_process_local_data
    # assembles the slices into the sharded global array. start_step resumes
    # the shuffle stream at the checkpointed cursor instead of epoch 0.
    assert args.batch_size % n_data == 0, "batch size must divide the data axis"
    assert args.batch_size % args.grad_accum == 0 and (
        args.batch_size // args.grad_accum
    ) % n_data == 0, "micro batch (batch-size/grad-accum) must divide the data axis"
    assert args.batch_size % jax.process_count() == 0, (
        "batch size must divide the process count (multi-host)"
    )
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()
    data_start_step = int(state.step)
    from mapdit_tpu.training.native_loader import NativeLatentLoader

    if not args.data_path.startswith("synthetic") and NativeLatentLoader.available(
        args.data_path
    ):
        # Native (C++) prefetching loader: mmap + background-thread gather
        # (tools/build_native.sh). Python path is the drop-in fallback.
        native = NativeLatentLoader(
            args.data_path, args.batch_size, seed=args.seed,
            num_threads=max(2, args.num_workers),
            process_index=proc_idx, process_count=proc_cnt,
            start_step=data_start_step,
        )
        batches = native.batches()
        logger.info("using native latent loader (prefetch threads)")
    else:
        batches = dataset.batches(
            batch_size=args.batch_size, seed=args.seed,
            process_index=proc_idx, process_count=proc_cnt,
            start_step=data_start_step,
        )

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    # Machine-readable metrics stream (one JSON object per log interval) —
    # production observability next to the reference-format log lines.
    metrics_sink = None
    if is_lead and args.metrics_jsonl:
        path = (
            args.metrics_jsonl
            if args.metrics_jsonl != "auto"
            else os.path.join(exp_dir, "metrics.jsonl")
        )
        metrics_sink = open(path, "a")

    logger.info(f"training for {args.num_steps} steps...")
    orbax_saver = None  # lazy async checkpointer (--checkpointer orbax)
    msgpack_saver = None  # lazy non-blocking msgpack writer (default backend)
    ema_writer = None  # lazy non-blocking EMA snapshot writer
    train_steps = int(state.step)
    log_steps = 0
    loss_buf = []  # on-device scalars; fetched once per log interval
    start_time = time.time()

    def save_checkpoint(step, st):
        """One checkpoint write (both backends). Orbax saves are collective —
        every process must call this; msgpack writes on the lead only."""
        nonlocal orbax_saver, msgpack_saver
        if args.checkpointer == "orbax":
            # collective: EVERY process must join the orbax save
            # barriers, or the lead deadlocks on a multi-host pod.
            # Async: save() returns after the host snapshot; the
            # directory write overlaps subsequent train steps.
            if orbax_saver is None:
                from mapdit_tpu.training.checkpoint import AsyncOrbaxSaver

                orbax_saver = AsyncOrbaxSaver()
            path = orbax_saver.save(exp_dir, step, st)
            logger.info(f"saving checkpoint to {path} at step {step}...")
        elif args.checkpointer == "msgpack-sync":
            if is_lead:
                path = save_state(exp_dir, step, st)
                logger.info(f"saving checkpoint to {path} at step {step}...")
        elif is_lead:
            # Default: non-blocking msgpack (VERDICT r04 #3) — a jitted
            # on-device snapshot copy returns in milliseconds; the host
            # fetch (~2 min/save through the relay) + atomic file write
            # run on a background thread, overlapped with training.
            if msgpack_saver is None:
                from mapdit_tpu.training.checkpoint import AsyncMsgpackSaver

                msgpack_saver = AsyncMsgpackSaver()
            try:
                path = msgpack_saver.save(exp_dir, step, st)
            except TimeoutError as e:
                # wedged relay bulk path (BENCH_NOTES r05): skip this save
                # rather than re-freeze the loop on an unbounded join
                logger.warning(f"checkpoint at step {step} SKIPPED: {e}")
                return
            logger.info(
                f"saving checkpoint to {path} at step {step} (async write)..."
            )

    def save_ema_snapshots(step, st):
        nonlocal ema_writer
        ema_dir = os.path.join(exp_dir, "ema")
        for std in ema_stds:
            tree = st.ema[ema_key(std)]
            if args.fsdp and jax.process_count() > 1:
                # FSDP shards span processes: re-replicate via a
                # collective (ALL processes must execute this jit)
                # so the lead holds full arrays to snapshot.
                tree = gather_replicated(tree)
            if is_lead:
                # Non-blocking like the checkpoints: on-device snapshot
                # now, fp16 fetch + write on the background writer (the
                # relay fetch is seconds-to-minutes the loop need not pay)
                if ema_writer is None:
                    from mapdit_tpu.training.checkpoint import AsyncTreeWriter

                    ema_writer = AsyncTreeWriter()
                try:
                    ema_writer.submit(
                        tree,
                        lambda host, _std=std, _step=step: (
                            ema_lib.save_snapshot(ema_dir, _std, _step, host)
                        ),
                    )
                except TimeoutError as e:
                    logger.warning(
                        f"ema snapshot std={std} step={step} SKIPPED: {e}"
                    )
        if is_lead:
            logger.info(f"saving ema snapshot to {ema_dir} at step {step}...")

    # Graceful preemption (TPU preemptible/spot VMs send SIGTERM to every
    # worker; the reference loses up to --ckpt-every steps of work — here the
    # loop finishes the in-flight step, checkpoints, and exits 0 so --resume
    # continues the exact trajectory). SIGINT gets the same treatment so an
    # interactive ^C never leaves a stale experiment dir behind.
    import signal

    preempt = {"sig": None}

    def _request_stop(signum, frame):
        preempt["sig"] = signal.Signals(signum).name

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _request_stop)

    def stop_agreed():
        """Whether the loop should exit now. Single process: immediately on
        the flag. Multi-host: every process must leave the loop at the SAME
        step (the step_fn and save paths are collective), so the local flags
        are OR-combined at synchronized points (log boundaries)."""
        if jax.process_count() == 1:
            return preempt["sig"] is not None
        if train_steps % args.log_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([preempt["sig"] is not None])
        )
        return bool(flags.any())

    def stage_batch(host_batch):
        if jax.process_count() > 1:
            # Each process holds its local slice; assemble the global array.
            return {
                k: jax.make_array_from_process_local_data(b_shard, v)
                for k, v in host_batch.items()
            }
        return {k: jax.device_put(v, b_shard) for k, v in host_batch.items()}

    # Device staging (VERDICT r04 #2, REFUTED on chip — BENCH_NOTES r05
    # "Host-stall attribution"): a background thread device_put'ing batch
    # k+1 while step k runs measured ~40% SLOWER than inline staging
    # through the axon relay, in both A/B orders with healthy relay
    # probes bracketing — the relay client serializes the second thread's
    # uploads against the main thread's dispatches, while the inline path
    # already overlaps the host work with the asynchronously-dispatched
    # step. Default is therefore inline; the thread stays as an explicit
    # opt-in for direct-attached hosts (stage_batch uses explicit
    # shardings, so it is thread-safe without the thread-local mesh).
    dev_prefetch = None
    if getattr(args, "device_prefetch", "off") == "thread":
        from mapdit_tpu.training.device_prefetch import DevicePrefetcher

        dev_prefetch = DevicePrefetcher(batches, stage_batch, depth=2)
        logger.info("device prefetch: double-buffered batch staging on")

    def next_staged():
        if dev_prefetch is not None:
            return next(dev_prefetch)
        return stage_batch(next(batches))

    try:
      with jax.set_mesh(mesh):
        while train_steps < args.num_steps:
            batch = next_staged()
            state, metrics = step_fn(state, batch)
            train_steps += 1
            log_steps += 1
            loss_buf.append(metrics["loss"])

            if train_steps % args.log_every == 0:
                # Interval-averaged loss (reference semantics, train.py:112-115)
                # with ONE host sync per interval instead of per step.
                avg_loss = float(jnp.mean(jnp.stack(loss_buf)))
                steps_per_sec = log_steps / (time.time() - start_time)
                logger.info(
                    f"(step={train_steps:07d}) train loss: {avg_loss:.4f}, "
                    f"train steps/sec: {steps_per_sec:.2f}"
                )
                mag_row = None
                if mag_probe is not None:
                    mag_row = mag_probe(state, batch, train_steps)
                    br = mag_row["block_rms"]
                    logger.info(
                        "(magnitudes) "
                        f"w_rms_dev mean {mag_row.get('w_rms_dev_mean', 0.0):.2e} "
                        f"max {mag_row.get('w_rms_dev_max', 0.0):.2e}, "
                        f"gain |.| max {mag_row.get('gain_abs_max', 0.0):.3f}, "
                        f"block_rms {br[0]:.3f}..{br[-1]:.3f}, "
                        f"out_rms {mag_row['out_rms']:.3f}"
                    )
                if metrics_sink is not None:
                    import json

                    row = {
                        "step": train_steps,
                        "loss": round(avg_loss, 6),
                        "steps_per_sec": round(steps_per_sec, 3),
                        "lr": float(schedule(train_steps)),
                        "samples_seen": train_steps * args.batch_size,
                        "wall_time": round(time.time(), 3),
                    }
                    if mag_row is not None:
                        row["magnitudes"] = mag_row
                    metrics_sink.write(json.dumps(row) + "\n")
                    metrics_sink.flush()
                loss_buf = []
                # local_devices: devices[0] may belong to another process
                stats = jax.local_devices()[0].memory_stats() or {}
                if stats:
                    logger.debug(
                        f"(memory) current={stats.get('bytes_in_use', 0)/1e9:.2f}GB, "
                        f"peak={stats.get('peak_bytes_in_use', 0)/1e9:.2f}GB"
                    )
                log_steps, start_time = 0, time.time()

            ckpt_now = train_steps % args.ckpt_every == 0 and train_steps > 0
            if ckpt_now:
                save_checkpoint(train_steps, state)

            ema_now = (
                args.ema_snapshot_every
                and train_steps % args.ema_snapshot_every == 0
                and train_steps > 0
            )
            if ema_now:
                save_ema_snapshots(train_steps, state)

            if stop_agreed():
                sig = preempt["sig"] or "SIGTERM"
                if not ckpt_now:
                    save_checkpoint(train_steps, state)
                if args.ema_snapshot_every and not ema_now:
                    save_ema_snapshots(train_steps, state)
                logger.info(
                    f"({sig}) graceful stop at step {train_steps}: state saved; "
                    f"continue with --resume {exp_dir}"
                )
                break

    finally:
        # ALSO on a mid-run exception: daemon writer threads holding
        # already-logged saves must drain before the interpreter exits,
        # or --resume silently restarts from an older step than the log
        # claims (r05 review finding)
        if dev_prefetch is not None:
            dev_prefetch.close()
        if ema_writer is not None:
            ema_writer.close()  # join the in-flight snapshot writes
        if msgpack_saver is not None:
            msgpack_saver.close()  # join the in-flight background write
        if orbax_saver is not None:
            orbax_saver.close()  # join the in-flight background write
        if args.profile_dir:
            jax.profiler.stop_trace()
        if metrics_sink is not None:
            metrics_sink.close()
    logger.info("done!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()

    # Training loop (reference train.py:225-248)
    parser.add_argument("--data-path", type=str, required=True,
                        help="latent dataset dir, or 'synthetic[:N]' for generated data")
    parser.add_argument("--results-dir", type=str, required=True)
    parser.add_argument("--model", type=str, choices=list(DIT_MODELS.keys()), default="DiT-XS/2")
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--num-steps", type=int, default=400_000)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--grad-clip", type=float, default=None,
                        help="global-norm gradient clipping (off by default, like the reference)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--verbose", type=int, choices=[0, 1, 2], default=1,
                        help="0: warning, 1: info, 2: debug")
    parser.add_argument("--num-workers", type=int, default=4,
                        help="accepted for reference CLI parity; the host "
                             "pipeline is index-gather only and needs no workers")
    parser.add_argument("--device-prefetch", choices=["off", "thread"],
                        default="off",
                        help="'thread' double-buffers the host->device batch "
                             "upload in a background thread — measured SLOWER "
                             "through the axon relay (BENCH_NOTES r05: the "
                             "relay serializes cross-thread uploads against "
                             "dispatch), kept as an A/B surface for "
                             "direct-attached hosts; default stages inline")
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("--ckpt-every", type=int, default=50_000)

    # LR schedule (reference defaults num_steps//150 and num_steps//10)
    parser.add_argument("--num-lin-warmup", type=int, default=None)
    parser.add_argument("--start-decay", type=int, default=None)

    # EMA
    parser.add_argument("--ema-snapshot-every", type=int, default=None)
    parser.add_argument("--ema-stds", type=float, nargs="*", default=list(EMA_STDS),
                        help="tracked power-EMA stds (reference: 0.05 0.1)")

    # MaP feature flags (README.md:57-66; all default ON = reference behavior)
    flag = lambda name: parser.add_argument(
        f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"), default=True,
        metavar="BOOL",
    )
    flag("use-cosine-attention")
    flag("use-weight-normalization")
    flag("use-forced-weight-normalization")
    flag("use-mp-residual")
    flag("use-mp-silu")
    parser.add_argument(
        "--use-no-layernorm", type=lambda s: s.lower() in ("1", "true", "yes"),
        default=True, metavar="BOOL",
        help="ON (reference) drops LayerNorm AND selects the MP conditioning "
             "arithmetic mp_sum(x*scale, shift, gain) everywhere; OFF restores "
             "pre-modulation LayerNorm AND the classic x*(1+scale)+shift "
             "arithmetic (vanilla DiT). The pairing is deliberate: the classic "
             "form assumes normalized activations (DiTConfig.mp_style)")
    flag("use-mp-pos-enc")
    flag("use-mp-embedding")
    parser.add_argument("--modulation", choices=["adaln", "rotation", "rotation_scale"],
                        default="adaln")
    parser.add_argument("--timestep-sampler", choices=["uniform", "loss-second-moment"],
                        default="uniform",
                        help="t importance sampling (the reference ships this "
                             "component unwired; here it is usable)")

    # TPU execution
    parser.add_argument("--n-model", type=int, default=1,
                        help="tensor-parallel mesh axis size (devices/n-model = data axis)")
    parser.add_argument("--fsdp", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="fully-sharded (ZeRO-3) params/optimizer/EMA over the "
                             "data axis — XL-scale memory; composes with --n-model")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="micro-batch gradient accumulation: scan over "
                             "batch-size/N slices, one optimizer update — same "
                             "trajectory, 1/N activation memory")
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default="float32")
    parser.add_argument("--matmul-precision", choices=["default", "high", "highest"],
                        default="default",
                        help="jax matmul precision for f32 operands (TPU: default "
                             "uses fast bf16 passes, highest forces full f32)")
    parser.add_argument("--remat", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="per-block activation rematerialization (XL-scale memory)")
    parser.add_argument("--scan-blocks", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="lax.scan over depth-stacked block params (XL-scale compile time)")
    parser.add_argument("--attention-impl",
                        choices=["auto", "xla", "pallas", "pallas_v2", "pallas_v3"],
                        default="auto")
    parser.add_argument("--block-kernel", choices=["auto", "pallas", "mega", "mega_attn", "off"],
                        default="auto",
                        help="block-fusion Pallas kernels: mega = whole-DiT-block "
                             "megakernel (one VMEM residency; MP+adaln family), "
                             "pallas = MP-MLP half-block only, auto/off = XLA")
    parser.add_argument("--attn-bwd", choices=["pallas", "residual", "reference"],
                        default="pallas",
                        help="VJP for --block-kernel mega_attn under grad: "
                             "pallas = fused backward kernel (flash-style "
                             "in-kernel recompute), residual = residual-emitting "
                             "forward kernel + pure-XLA backward (no recompute), "
                             "reference = jnp recompute")
    parser.add_argument("--checkpointer",
                        choices=["msgpack", "msgpack-sync", "orbax"],
                        default="msgpack",
                        help="checkpoint backend. msgpack (default) snapshots "
                             "on device and writes from a background thread "
                             "(non-blocking); msgpack-sync is the old "
                             "stall-the-loop path (A/B + low-memory escape "
                             "hatch); orbax = async directory checkpoints "
                             "(required for multi-host FSDP)")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint file or experiment dir to resume from")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--metrics-jsonl", type=str, default=None,
                        help="append one JSON metrics object per log interval "
                             "('auto' = <exp_dir>/metrics.jsonl)")
    parser.add_argument("--log-magnitudes", action="store_true",
                        help="per log interval, record magnitude-preservation "
                             "telemetry: weight-row RMS deviation (the forced-WN "
                             "invariant), gain magnitudes, and per-block "
                             "residual-stream RMS at t=T/2 (one extra forward)")
    parser.add_argument("--multihost", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL",
                        help="call jax.distributed.initialize() (one process per host)")

    main(parser.parse_args())
