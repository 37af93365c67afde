#!/usr/bin/env python
"""Batching HTTP inference server around the compiled sampler.

Beyond-reference production subsystem (the reference has no serving path;
its closest surface is re-running `sample.py` per request, paying model
reload + EMA solve + full recompile every time). Design points, TPU-first:

  * **Compile-once bucket cache**: XLA programs are specialized on static
    shapes, so requests are padded up to a fixed set of batch buckets and
    each (sampler, steps, cfg_scale, bucket, schedule) program is compiled
    once and reused. Weights are loaded and EMA-reconstructed once.
  * **One device, one dispatcher**: a dispatcher thread owns all device
    work and **coalesces** concurrent same-protocol requests into one
    padded batch (see SamplerService); HTTP threads only pay JSON/PNG
    work concurrently.
  * Stateless request protocol (class labels + optional seed in, PNG grid
    or ADM-format npz out) so replicas can sit behind any LB. With the
    deterministic samplers, a request's output depends only on its own
    seed — not on what it was batched with.

Endpoints:
  GET  /healthz            -> {"status": "ok", ...model/config info}
  POST /v1/sample          -> image/png grid or application/x-npz
      {"class_labels": [207, 360] | "class_label": 88, "num_samples": 4,
       "steps": 20, "sampler": "ddpm|ddim|dpm++", "cfg_scale": 4.0,
       "schedule": "uniform|karras", "cache_interval": 0, "seed": 0,
       "cfg_interval": [0.3, 3.0], "dynamic_threshold": 0.995,
       "format": "png|npz"}
      cache_interval >= 2 enables Delta-DiT block-span caching (LOSSY —
      docs/BENCH_NOTES.md records the deviation; ddpm/dpm++ only, must
      divide steps). cache_mode = "forecast" (default) linearly
      extrapolates the cached span delta across skip steps (static
      Predict-to-Skip, arXiv 2602.18093); "hold" keeps it constant
      (Delta-DiT). Same FLOPs; forecast measures a smaller deviation on
      every trained checkpoint probed (BENCH_NOTES r03s7 + r04 grids).
      cfg_interval = [sigma_lo, sigma_hi] enables limited-interval guidance
      (arXiv 2404.07724): CFG only on steps with sigma(t) inside the
      interval, cond-only half-batch calls elsewhere (cheaper AND better
      FID at high cfg_scale per the paper; ddpm/dpm++, cfg_scale > 1).
      Stacks with cache_interval (the guided range snaps outward to
      cache-group boundaries).

Example:
  python serve.py --result-dir results/000-DiT-S-2 --port 8000 &
  curl -s -X POST localhost:8000/v1/sample \
       -d '{"class_label": 88, "num_samples": 4, "steps": 20, "sampler": "dpm++"}' \
       -o grid.png
"""

import argparse
import io
import json
import os
import threading
import time

import numpy as np


class QueueFullError(Exception):
    """Pending-request cap hit — surfaces as HTTP 503 (shed load now,
    retry later) instead of letting queues grow without bound."""


class RequestTimeoutError(Exception):
    """The per-request deadline elapsed before the dispatcher finished —
    surfaces as HTTP 504. The job is abandoned (skipped if still queued)."""


class _Job:
    """One request in the coalescing queue."""

    __slots__ = ("labels", "seed", "done", "result", "error", "abandoned")

    def __init__(self, labels, seed):
        self.labels = labels
        self.seed = seed
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False  # set on timeout; dispatcher skips it


class SamplerService:
    """Loads a trained experiment once; serves padded-bucket sample calls.

    Concurrent requests with the same protocol (sampler, steps, cfg_scale,
    schedule) are **coalesced** into one device batch by a dispatcher
    thread: the first request waits up to ``coalesce_ms`` for companions,
    then the group runs as a single padded-bucket program and results are
    split per request. Initial latents are drawn from each request's own
    key, so with the deterministic samplers (dpm++, ddim eta=0) a request's
    output is identical whether it ran alone or coalesced — seed
    determinism survives batching. (Stochastic chains share per-step noise
    across the batch; their outputs remain seed-reproducible only for
    identical batch compositions.)
    """

    def __init__(
        self,
        result_dir: str,
        ckpt=None,
        ema_std: float = 0.05,
        use_vae: bool = False,
        vae_path=None,
        buckets=(1, 4, 8),
        seed: int = 0,
        coalesce_ms: float = 3.0,
        shard: bool = True,
        n_model: int = 1,
        max_programs: int = 32,
        max_pending: int = 64,
        request_timeout_s: float = 600.0,
        preamble: str = "host",
    ):
        import jax

        from mapdit_tpu.utils import load_config
        from mapdit_tpu.utils.experiment import config_from_args
        from sample import load_variables

        # Data-parallel serving: buckets divisible by the device count run
        # sharded over a ('data',) mesh (GSPMD replicates params, splits the
        # chain batch) — one request can use a whole v5e slice. n_model > 1
        # carves a tensor-parallel axis out of the fleet instead (the
        # latency layout: every chain model call splits its matmuls over
        # 'model' with GSPMD psums; see build_sample_fn mesh=) — worth it
        # when buckets are too small to fill a data axis.
        self._mesh = None
        self._n_model = max(1, int(n_model))
        if self._n_model > 1:
            if not shard:
                raise ValueError("--n-model needs --shard true")
            if len(jax.devices()) % self._n_model:
                raise ValueError(
                    f"--n-model {self._n_model} does not divide the "
                    f"{len(jax.devices())}-device fleet"
                )
        if shard and len(jax.devices()) > 1:
            from mapdit_tpu.parallel import batch_sharding, make_mesh

            self._mesh = make_mesh(n_model=self._n_model)
            self._b_shard = batch_sharding(self._mesh)
        self.result_dir = result_dir
        self.train_args = load_config(result_dir)
        self.cfg = config_from_args(self.train_args)
        # Distilled student (distill.py): exactly ONE valid chain — its own
        # nested DDIM grid, guidance baked. Requests are normalized onto it
        # (sampler/steps/cfg_scale in the body are advisory for these dirs).
        self._distilled = bool(self.train_args.get("distill_rounds"))
        self._student_steps = (
            int(self.train_args["distill_num_steps"]) if self._distilled else None
        )
        if self._n_model > 1 and self.cfg.block_kernel not in ("auto", "off"):
            # fail at startup, not on the first request: build_sample_fn
            # rejects explicit Pallas kernels on a GSPMD mesh (no
            # partitioning rule for the custom-calls)
            raise ValueError(
                f"--n-model {self._n_model} needs block_kernel auto/off "
                f"(experiment config pins '{self.cfg.block_kernel}', which "
                "cannot be GSPMD-partitioned)"
            )
        self.variables = load_variables(result_dir, self.train_args, ckpt, ema_std)
        self.use_vae = use_vae
        self.vae_path = vae_path
        self._decoder = None
        if use_vae:
            from mapdit_tpu.models.vae import load_decoder

            self._decoder = load_decoder(vae_path)  # load weights ONCE
        self.buckets = tuple(sorted(set(buckets)))
        assert preamble in ("host", "fused"), preamble
        if preamble == "fused" and self._mesh is not None:
            # fused wrapping targets the plain single-device path; sharded
            # layouts keep the host preamble (their device_put IS the
            # sharding boundary)
            raise ValueError("--preamble fused requires a single device")
        self.preamble = preamble
        self.coalesce_ms = coalesce_ms
        self.max_programs = max_programs
        self.max_pending = max_pending
        self.request_timeout_s = request_timeout_s
        self._pending = 0  # jobs enqueued but not yet taken by the dispatcher
        self._timeouts = 0
        self._rejected = 0
        # end-to-end request latency (enqueue -> result), Prometheus
        # summary-style counters
        self._lat_sum = 0.0
        self._lat_count = 0
        self._lat_max = 0.0
        # device-chain time per coalesced batch (the jitted sampling call
        # only — excludes HTTP/coalesce/PNG): separates model cost from the
        # serving floor in the /metrics latency story. The FIRST invocation
        # of each compiled protocol carries the multi-minute XLA compile —
        # it is recorded separately as compile_seconds so chain_seconds
        # reflects steady-state device time (ADVICE r04).
        self._chain_sum = 0.0
        self._chain_count = 0
        self._chain_max = 0.0
        self._compile_sum = 0.0
        self._compile_count = 0
        self._warm_keys = set()
        # (sampler, steps, cfg_scale, bucket, schedule, cache_interval,
        #  cfg_interval, cache_mode) -> compiled sample fn
        self._fns = {}
        self._base_key = jax.random.PRNGKey(seed)
        self._request_counter = 0
        self._coalesced_batches = 0
        self._batches_run = 0
        self.started = time.time()
        # protocol-key -> list of pending _Job; one dispatcher owns the device
        self._queues = {}
        self._cv = threading.Condition()
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._dispatcher.start()

    # ------------------------------------------------------------------ #

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"num_samples {n} exceeds the largest batch bucket {self.buckets[-1]}"
        )

    def _get_fn(
        self, sampler: str, steps: int, cfg_scale: float, bucket: int,
        schedule: str = "uniform", cache_interval: int = 0, cfg_interval=None,
        cache_mode: str = "forecast", dynamic_threshold=None,
    ):
        import jax
        import jax.numpy as jnp

        from mapdit_tpu.diffusion import create_diffusion, respacing_string
        from mapdit_tpu.runtime import build_cached_sample_fn, build_sample_fn

        key = (
            sampler, steps, float(cfg_scale), bucket, schedule, cache_interval,
            cfg_interval, cache_mode, dynamic_threshold,
        )
        fn = self._fns.get(key)
        if fn is None:
            if len(self._fns) >= self.max_programs:
                # each new protocol costs a multi-minute XLA compile that
                # stalls the single dispatcher — bound it instead of letting
                # a protocol-scanning client wedge the server
                raise ValueError(
                    f"compile budget exhausted ({self.max_programs} programs); "
                    "reuse an already-compiled (sampler, steps, cfg_scale, "
                    "schedule, cache_interval, cfg_interval, cache_mode) "
                    "protocol or restart with --max-programs"
                )
            if self._distilled:
                from mapdit_tpu.diffusion.distill import (
                    student_diffusion_from_config,
                )

                diffusion = student_diffusion_from_config(self.train_args)
            else:
                diffusion = create_diffusion(
                    respacing_string(steps, sampler, schedule)
                )
            n_dev = self._mesh.shape["data"] if self._mesh is not None else 1
            if cache_interval > 1 and self._n_model > 1:
                # the cached builder has no TP support: under the TP mesh it
                # would replicate params and duplicate 100% of the work
                # across the 'model' axis — reject instead of silently
                # defeating the latency layout (surfaces as a 400)
                raise ValueError(
                    "cache_interval is not supported on a tensor-parallel "
                    "(--n-model) server; use a data-parallel fleet for "
                    "cached protocols"
                )
            if cache_interval > 1:
                # Delta-DiT block-span caching (LOSSY; docs/BENCH_NOTES.md)
                fn = build_cached_sample_fn(
                    self.cfg,
                    self.variables,
                    diffusion,
                    cfg_scale=cfg_scale if cfg_scale > 1.0 else None,
                    cache_interval=cache_interval,
                    sampler=sampler,
                    cfg_interval=cfg_interval,
                    cache_mode=cache_mode,
                    dynamic_threshold=dynamic_threshold,
                )
            elif n_dev > 1 and bucket % n_dev == 0 and self._n_model == 1:
                # Multi-chip: per-shard single-chip chains (shard_map) keep
                # the Pallas megakernels live — GSPMD cannot partition their
                # custom-calls, so the plain path loses them on a mesh
                # (docs/BENCH_NOTES r03s5). Un-doubled interface: the CFG
                # doubling happens per shard inside the wrapper. (TP serving
                # takes the plain GSPMD path below instead.)
                from mapdit_tpu.runtime import build_dp_sharded_sample_fn

                fn = build_dp_sharded_sample_fn(
                    self.cfg,
                    self.variables,
                    diffusion,
                    self._mesh,
                    cfg_scale=cfg_scale if cfg_scale > 1.0 else None,
                    sampler=sampler,
                    cfg_interval=cfg_interval,
                    batch_hint=bucket,
                    dynamic_threshold=dynamic_threshold,
                )
                fn = (fn, "shard_map")
            else:
                fn = build_sample_fn(
                    self.cfg,
                    self.variables,
                    diffusion,
                    cfg_scale=cfg_scale if cfg_scale > 1.0 else None,
                    sampler=sampler,
                    cfg_interval=cfg_interval,
                    batch_hint=bucket,
                    dynamic_threshold=dynamic_threshold,
                    mesh=self._mesh if self._n_model > 1 else None,
                )
            if not isinstance(fn, tuple):
                fn = (fn, "plain")
            if (
                fn[1] == "plain"
                and self._mesh is None
                and self.preamble == "fused"
            ):
                # Fused preamble (VERDICT r04 #8): the per-request device
                # preamble (per-job key derivation + z draws + CFG
                # doubling + chain-key fold_in) used to run eagerly — each
                # op a relay dispatch round-trip (~80-100 ms/request tax
                # through a degraded tunnel). Fold it ALL into the jitted
                # chain: one dispatch per request. Seed contract: per-ROW
                # z keys for SEEDED requests are
                # fold_in(fold_in(fold_in(zroot, seed_lo32), seed_hi32), row)
                # — batch-composition-independent AND server-independent
                # (two folds because fold_in data is 32-bit and sample()
                # accepts 63-bit seeds); UNSEEDED rows keep the host
                # contract's entropy source (the server --seed key + a
                # fresh counter), so restarts do not replay the stream and
                # counter N never collides with explicit seed=N.
                base_fn = fn[0]
                c = self.train_args["in_channels"]
                s = self.train_args["input_size"]
                num_classes = self.cfg.num_classes
                zroot = jax.random.PRNGKey(0)
                anon_root, ckey = jax.random.split(self._base_key)
                double = cfg_scale > 1.0

                @jax.jit
                def fused(sd_lo, sd_hi, rows, is_seeded, y_rows, chain_ctr):
                    def row_key(lo, hi, r, seeded):
                        k_seed = jax.random.fold_in(
                            jax.random.fold_in(
                                jax.random.fold_in(zroot, lo), hi
                            ),
                            r,
                        )
                        k_anon = jax.random.fold_in(
                            jax.random.fold_in(anon_root, lo), r
                        )
                        # raw uint32 keys (PRNGKey family): the key IS
                        # its data, so a plain where selects between them
                        return jnp.where(seeded, k_seed, k_anon)

                    keys = jax.vmap(row_key)(sd_lo, sd_hi, rows, is_seeded)
                    z = jax.vmap(
                        lambda k: jax.random.normal(k, (c, s, s))
                    )(keys)
                    skey = jax.random.fold_in(ckey, chain_ctr)
                    if double:
                        z = jnp.concatenate([z, z], axis=0)
                        y = jnp.concatenate([
                            y_rows,
                            jnp.full((y_rows.shape[0],), num_classes, jnp.int32),
                        ])
                    else:
                        y = y_rows
                    return base_fn(z, y, skey)

                fn = (fused, "fused")
            self._fns[key] = fn
        return fn

    def warmup(self, sampler: str, steps: int, cfg_scale: float, **protocol):
        """Precompile the largest bucket so the first request is fast.
        Extra protocol fields (schedule / cache_interval / cfg_interval /
        cache_mode) pass through — --warmup-protocols uses this to warm
        every production protocol at startup instead of paying the compile
        on its first request (the 504-timeout path)."""
        self.sample(
            [0] * self.buckets[-1], steps, sampler, cfg_scale, seed=0, **protocol
        )

    # ------------------------------------------------------------------ #

    def sample(
        self, class_labels, steps, sampler, cfg_scale, seed=None,
        schedule="uniform", cache_interval=0, cfg_interval=None,
        cache_mode="forecast", dynamic_threshold=None,
    ):
        """(labels, protocol) -> float latents/images (n, C, H, W) in [-1, 1].

        Called from HTTP threads: validates, enqueues a job under the
        protocol key, and blocks until the dispatcher fills in the result
        (already decoded — the dispatcher thread owns all device work).
        """
        n = len(class_labels)
        if n < 1:
            raise ValueError("num_samples / class_labels must request >= 1 sample")
        if self._distilled:
            # one valid protocol: normalize onto the student grid; the
            # accelerator fields cannot apply to a distilled chain
            if int(cache_interval) > 1 or cfg_interval is not None:
                raise ValueError(
                    "cache_interval / cfg_interval do not apply to a "
                    "distilled student (already a few-step exact chain)"
                )
            sampler, steps, schedule = "ddim", self._student_steps, "uniform"
            cfg_scale = 1.0  # guidance baked at distill time (if any)
        self._bucket(n)  # reject oversize requests before enqueueing
        num_classes = self.cfg.num_classes
        for lab in class_labels:
            if not 0 <= int(lab) < num_classes:
                raise ValueError(f"class label {lab} outside [0, {num_classes})")
        if seed is not None:
            # validate HERE: a bad seed must fail this request alone, not
            # poison a coalesced group inside the dispatcher
            try:
                seed = int(seed)
            except (TypeError, ValueError):
                raise ValueError(f"seed must be an integer, got {seed!r}") from None
            if not 0 <= seed < 2**63:
                raise ValueError("seed must be in [0, 2**63)")
        cfg_scale = float(cfg_scale)
        if cfg_scale <= 1.0:
            cfg_scale = 1.0  # all <=1 values compile the identical no-CFG program
        cache_interval = int(cache_interval)
        if cache_interval > 1:
            if sampler not in ("ddpm", "dpm++"):
                raise ValueError(
                    "cache_interval composes with sampler ddpm or dpm++"
                )
            if int(steps) % cache_interval != 0:
                raise ValueError(
                    f"cache_interval {cache_interval} must divide steps {steps}"
                )
        elif cache_interval < 0:
            raise ValueError("cache_interval must be >= 0")
        if cache_mode not in ("hold", "forecast"):
            raise ValueError("cache_mode must be 'hold' or 'forecast'")
        if cache_interval <= 1:
            cache_mode = "hold"  # no skip steps: both modes compile the
            # identical program — normalize so the key dedupes
        if cfg_interval is not None:
            # limited-interval guidance (arXiv 2404.07724): validate at
            # admission so a bad interval fails this request alone
            try:
                lo, hi = (float(v) for v in cfg_interval)
            except (TypeError, ValueError):
                raise ValueError(
                    "cfg_interval must be [sigma_lo, sigma_hi] (two numbers)"
                ) from None
            if not (0.0 <= lo <= hi):
                raise ValueError("cfg_interval needs 0 <= sigma_lo <= sigma_hi")
            if cfg_scale <= 1.0:
                raise ValueError("cfg_interval needs cfg_scale > 1")
            if sampler not in ("ddpm", "dpm++", "unipc"):
                raise ValueError(
                    "cfg_interval composes with sampler ddpm, dpm++ or unipc"
                )
            cfg_interval = (lo, hi)
        if dynamic_threshold is not None:
            try:
                dynamic_threshold = float(dynamic_threshold)
            except (TypeError, ValueError):
                raise ValueError(
                    "dynamic_threshold must be a number in (0, 1]"
                ) from None
            if not 0.0 < dynamic_threshold <= 1.0:
                raise ValueError("dynamic_threshold must be in (0, 1]")

        job = _Job(np.asarray(class_labels, np.int32), seed)
        key = (
            sampler, int(steps), cfg_scale, schedule, cache_interval,
            cfg_interval, cache_mode, dynamic_threshold,
        )
        with self._cv:
            # Backpressure: bound the pending queue (503 on overflow) and
            # gate brand-new protocols on the compile budget at ADMISSION,
            # so a protocol-scanning client is turned away with a 400
            # before it can park jobs behind a multi-minute compile.
            if self._pending >= self.max_pending:
                self._rejected += 1
                raise QueueFullError(
                    f"server overloaded: {self._pending} pending requests "
                    f"(max {self.max_pending}); retry later"
                )
            # _fns keys carry an extra bucket element at index 3
            if (
                len(self._fns) >= self.max_programs
                and not any(k[:3] + k[4:] == key for k in self._fns)
            ):
                raise ValueError(
                    f"compile budget exhausted ({self.max_programs} programs); "
                    "reuse an already-compiled (sampler, steps, cfg_scale, "
                    "schedule, cache_interval, cfg_interval, cache_mode) "
                    "protocol or restart with --max-programs"
                )
            self._pending += 1
            self._queues.setdefault(key, []).append(job)
            self._cv.notify()
        enqueue_t = time.time()
        if not job.done.wait(timeout=self.request_timeout_s or None):
            job.abandoned = True  # dispatcher will skip it if still queued
            self._timeouts += 1
            raise RequestTimeoutError(
                f"request did not complete within {self.request_timeout_s:g}s "
                "(first use of a protocol pays its XLA compile; warm protocols "
                "or raise --request-timeout-s)"
            )
        if job.error is not None:
            raise job.error
        elapsed = time.time() - enqueue_t
        with self._cv:
            self._lat_sum += elapsed
            self._lat_count += 1
            self._lat_max = max(self._lat_max, elapsed)
        return job.result

    # ---------------------------------------------------------------- #
    # dispatcher: owns the device; coalesces compatible jobs per batch

    def _take_group(self):
        """Block until work exists; return (protocol_key, jobs) where the
        jobs fit one bucket. Waits coalesce_ms for companions first."""
        with self._cv:
            while not any(self._queues.values()):
                self._cv.wait()
        if self.coalesce_ms > 0:
            time.sleep(self.coalesce_ms / 1e3)
        with self._cv:
            key = next(k for k, v in self._queues.items() if v)
            # round-robin across protocols: move the served key to the back
            # so a sustained stream on one protocol cannot starve others
            self._queues[key] = self._queues.pop(key)
            pending = self._queues[key]
            group, rows = [], 0
            while pending and rows + len(pending[0].labels) <= self.buckets[-1]:
                job = pending.pop(0)
                self._pending -= 1
                if job.abandoned:  # timed out while queued — don't run it
                    continue
                group.append(job)
                rows += len(job.labels)
            return key, group

    def _dispatch_loop(self):
        while True:
            try:
                key, group = self._take_group()
            except Exception:  # noqa: BLE001 — queue plumbing must not die
                import traceback

                traceback.print_exc()
                time.sleep(0.1)
                continue
            if not group:  # every queued job timed out before we got to it
                continue
            try:
                self._run_group(key, group)
            except Exception as e:  # noqa: BLE001 — propagate to every waiter
                for job in group:
                    job.error = e
                    job.done.set()

    def _run_group(self, key, group):
        import jax
        import jax.numpy as jnp

        (sampler, steps, cfg_scale, schedule, cache_interval, cfg_interval,
         cache_mode, dynamic_threshold) = key
        n = sum(len(j.labels) for j in group)
        bucket = self._bucket(n)
        num_classes = self.cfg.num_classes
        c = self.train_args["in_channels"]
        s = self.train_args["input_size"]

        fn, layout = self._get_fn(
            sampler, steps, cfg_scale, bucket, schedule, cache_interval,
            cfg_interval, cache_mode, dynamic_threshold,
        )
        # compiled-program identity (includes bucket): first run per program
        # is the compile call, kept out of the steady-state chain window
        fn_key = (
            sampler, steps, float(cfg_scale), bucket, schedule,
            cache_interval, cfg_interval, cache_mode, dynamic_threshold,
        )

        if layout == "fused":
            # One-dispatch preamble (VERDICT r04 #8): everything below is
            # host-side numpy; the single jit call derives per-row z keys,
            # draws z, doubles for CFG and folds the chain key — no eager
            # device ops at all. 63-bit seeds ride as two uint32 halves
            # (fold_in data is 32-bit; truncating would alias seed 2^32+k
            # with seed k and overflow-crash on numpy 2.x).
            lo, hi, rows, seeded, labels = [], [], [], [], []
            for job in group:
                if job.seed is None:
                    self._request_counter += 1
                    sd, is_seeded = self._request_counter, 0
                else:
                    sd, is_seeded = int(job.seed), 1
                k = len(job.labels)
                lo.extend([sd & 0xFFFFFFFF] * k)
                hi.extend([(sd >> 32) & 0x7FFFFFFF] * k)
                seeded.extend([is_seeded] * k)
                rows.extend(range(k))
                labels.append(job.labels)
            pad = bucket - n
            if pad:
                lo.extend([0] * pad)
                hi.extend([0] * pad)
                seeded.extend([0] * pad)
                rows.extend(range(pad))
                labels.append(np.zeros((pad,), np.int32))
            self._request_counter += 1
            chain_ctr = np.uint32(self._request_counter)
            args_np = (
                np.asarray(lo, np.uint32),
                np.asarray(hi, np.uint32),
                np.asarray(rows, np.uint32),
                np.asarray(seeded, np.bool_),
                np.asarray(np.concatenate(labels), np.int32),
            )

            chain_t0 = time.perf_counter()
            out = np.asarray(fn(*args_np, chain_ctr))[:n]
            chain_s = time.perf_counter() - chain_t0
            self._finish_group(group, out, fn_key, chain_s)
            return

        # Per-request z keys: row noise is independent of batch position,
        # so deterministic samplers give coalescing-invariant outputs.
        zs, labels = [], []
        for job in group:
            if job.seed is None:
                self._request_counter += 1
                jkey = jax.random.fold_in(self._base_key, self._request_counter)
            else:
                jkey = jax.random.PRNGKey(int(job.seed))
            zkey, _ = jax.random.split(jkey)
            zs.append(jax.random.normal(zkey, (len(job.labels), c, s, s)))
            labels.append(job.labels)
        pad = bucket - n
        if pad:
            zs.append(jnp.zeros((pad, c, s, s)))
            labels.append(np.zeros((pad,), np.int32))
        z = jnp.concatenate(zs, axis=0)
        y_rows = jnp.asarray(np.concatenate(labels))

        # chain noise (DDPM / eta>0 DDIM only): fresh stream per batch
        self._request_counter += 1
        skey = jax.random.fold_in(self._base_key, self._request_counter)

        chain_t0 = time.perf_counter()
        if layout == "shard_map":
            # un-doubled interface: per-shard CFG doubling inside the
            # wrapper (pairs never straddle shards, megakernels stay live)
            z = jax.device_put(z, self._b_shard)
            y = jax.device_put(y_rows, self._b_shard)
            with jax.set_mesh(self._mesh):
                out = np.asarray(fn(z, y, skey))[:n]
        else:
            if cfg_scale > 1.0:
                # reference CFG batch contract: [z; z], [labels; null]
                z = jnp.concatenate([z, z], axis=0)
                y = jnp.concatenate(
                    [y_rows, jnp.full((bucket,), num_classes, jnp.int32)]
                )
            else:
                y = y_rows
            n_dev = self._mesh.shape["data"] if self._mesh is not None else 1
            cfg_rows = 2 * bucket if cfg_scale > 1.0 else bucket
            divisible = bucket % n_dev == 0 and cfg_rows % n_dev == 0
            if self._mesh is not None and (
                (n_dev > 1 and divisible) or self._n_model > 1
            ):
                # TP programs always run under the mesh (params carry
                # explicit 'model'-axis shardings); the batch rides the
                # data axis whenever the bucket divides it.
                if divisible:
                    z = jax.device_put(z, self._b_shard)
                    y = jax.device_put(y, self._b_shard)
                with jax.set_mesh(self._mesh):
                    out = np.asarray(fn(z, y, skey))[:n]
            else:
                out = np.asarray(fn(z, y, skey))[:n]
        chain_s = time.perf_counter() - chain_t0  # np.asarray synced
        self._finish_group(group, out, fn_key, chain_s)

    def _finish_group(self, group, out, fn_key, chain_s):
        """Shared tail of _run_group: chain accounting, decode, fan-out."""
        if fn_key in self._warm_keys:
            self._chain_sum += chain_s
            self._chain_count += 1
            self._chain_max = max(self._chain_max, chain_s)
        else:
            # first call of this compiled protocol: XLA compile dominates —
            # keep it out of the steady-state chain window
            self._warm_keys.add(fn_key)
            self._compile_sum += chain_s
            self._compile_count += 1
        # decode on this thread too — the dispatcher owns all device work
        from sample import decode_latents

        out = decode_latents(
            out, self.train_args, self.use_vae, self.vae_path,
            decoder=self._decoder,
        )

        self._batches_run += 1
        if len(group) > 1:
            self._coalesced_batches += 1
        off = 0
        for job in group:
            job.result = out[off : off + len(job.labels)]
            off += len(job.labels)
            job.done.set()

    def info(self) -> dict:
        return {
            "status": "ok",
            "model": self.train_args.get("model"),
            "num_classes": self.cfg.num_classes,
            "input_size": self.train_args["input_size"],
            "in_channels": self.train_args["in_channels"],
            "buckets": list(self.buckets),
            "devices": self._mesh.devices.size if self._mesh is not None else 1,
            "mesh": dict(self._mesh.shape) if self._mesh is not None else
                    {"data": 1, "model": 1},
            "compiled_programs": len(self._fns),
            "max_programs": self.max_programs,
            "batches_run": self._batches_run,
            "coalesced_batches": self._coalesced_batches,
            "pending": self._pending,
            "max_pending": self.max_pending,
            "request_timeout_s": self.request_timeout_s,
            "timeouts": self._timeouts,
            "rejected": self._rejected,
            "request_latency_seconds_sum": round(self._lat_sum, 4),
            "request_latency_seconds_count": self._lat_count,
            "request_latency_seconds_max": round(self._lat_max, 4),
            "chain_seconds_sum": round(self._chain_sum, 4),
            "chain_seconds_count": self._chain_count,
            "chain_seconds_max": round(self._chain_max, 4),
            # first-invocation-per-protocol time (XLA compile + first run),
            # excluded from the chain_seconds steady-state window
            "compile_seconds_sum": round(self._compile_sum, 4),
            "compile_seconds_count": self._compile_count,
            "preamble": self.preamble,
            "coalesce_ms": self.coalesce_ms,
            "uptime_s": round(time.time() - self.started, 1),
            "decode": "vae" if self.use_vae else "latent",
            # ddpm draws per-step noise shaped like the coalesced batch; a
            # seed reproduces its output only for identical batch
            # compositions (X-Seed-Deterministic response header per request)
            "seed_deterministic_samplers": ["dpm++", "unipc", "ddim"],
            # distilled students pin the protocol server-side (distill.py):
            # every request runs the student's own few-step DDIM grid
            "distilled": (
                {
                    "steps": self._student_steps,
                    "rounds": int(self.train_args["distill_rounds"]),
                    "baked_cfg_scale": float(
                        self.train_args.get("distill_cfg_scale", 1.0)
                    ),
                }
                if self._distilled
                else None
            ),
        }


def make_handler(service: SamplerService, defaults: dict):
    from http.server import BaseHTTPRequestHandler

    from mapdit_tpu.utils.image import save_image_grid, to_uint8

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, obj: dict, headers=None):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code: int, body: bytes, ctype: str, headers=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/info"):
                self._json(200, service.info())
            elif self.path == "/metrics":
                # Prometheus text exposition of the numeric counters
                info = service.info()
                lines = []
                for k, v in info.items():
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        lines.append(f"# TYPE mapdit_{k} gauge")
                        lines.append(f"mapdit_{k} {v}")
                body = ("\n".join(lines) + "\n").encode()
                self._bytes(200, body, "text/plain; version=0.0.4")
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/v1/sample":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                labels = req.get("class_labels")
                if labels is not None:
                    if not isinstance(labels, list):
                        raise ValueError("class_labels must be a list of integers")
                    labels = [int(lab) for lab in labels]
                else:
                    labels = [int(req.get("class_label", 0))] * int(
                        req.get("num_samples", 1)
                    )
                steps = int(req.get("steps", defaults["steps"]))
                sampler = req.get("sampler", defaults["sampler"])
                if sampler not in ("ddpm", "ddim", "dpm++", "unipc"):
                    raise ValueError(f"unknown sampler {sampler!r}")
                if not 1 <= steps <= 1000:
                    raise ValueError("steps must be in [1, 1000]")
                cfg_scale = float(req.get("cfg_scale", defaults["cfg_scale"]))
                schedule = req.get("schedule", "uniform")
                if schedule not in ("uniform", "karras"):
                    raise ValueError(f"unknown schedule {schedule!r}")
                fmt = req.get("format", "png")
                if fmt not in ("png", "npz"):
                    raise ValueError(f"unknown format {fmt!r}")
                cache_interval = int(req.get("cache_interval", 0))
                samples = service.sample(
                    labels, steps, sampler, cfg_scale, seed=req.get("seed"),
                    schedule=schedule, cache_interval=cache_interval,
                    cfg_interval=req.get("cfg_interval"),
                    cache_mode=req.get("cache_mode", "forecast"),
                    dynamic_threshold=req.get("dynamic_threshold"),
                )
            except QueueFullError as e:
                # standard shed-load signal
                self._json(503, {"error": str(e)}, {"Retry-After": "5"})
                return
            except RequestTimeoutError as e:
                self._json(504, {"error": str(e)})
                return
            except (ValueError, TypeError) as e:
                # TypeError covers malformed JSON value types (e.g. a dict
                # where an int belongs) — a client error, not a server fault
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface as a 500, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return

            # Seed determinism disclosure: stochastic chains (ddpm) draw
            # per-step noise shaped like the coalesced batch, so a seed only
            # reproduces the output for identical batch compositions.
            headers = {
                "X-Seed-Deterministic": "false" if sampler == "ddpm" else "true"
            }
            buf = io.BytesIO()
            if fmt == "npz":
                # ADM evaluator format, like sample_fid.py (arr_0 uint8 NHWC)
                np.savez(buf, arr_0=to_uint8(samples))
                self._bytes(200, buf.getvalue(), "application/x-npz", headers)
            else:
                nrow = int(np.ceil(np.sqrt(len(samples))))
                save_image_grid(samples, buf, nrow=max(1, nrow), format="PNG")
                self._bytes(200, buf.getvalue(), "image/png", headers)

        def log_message(self, fmt, *args):  # route through stdout, one line
            print(f"[serve] {self.address_string()} {fmt % args}", flush=True)

    return Handler


def main(args):
    from mapdit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend

    fail_fast_on_dead_backend(label="serve")
    from http.server import ThreadingHTTPServer

    service = SamplerService(
        args.result_dir,
        ckpt=args.ckpt,
        ema_std=args.ema_std,
        use_vae=args.use_vae,
        vae_path=args.vae_path,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        seed=args.seed,
        coalesce_ms=args.coalesce_ms,
        shard=args.shard,
        n_model=args.n_model,
        max_programs=args.max_programs,
        max_pending=args.max_pending,
        request_timeout_s=args.request_timeout_s,
        preamble=args.preamble,
    )
    defaults = {
        "steps": args.default_steps,
        "sampler": args.default_sampler,
        "cfg_scale": args.default_cfg_scale,
    }
    if args.warmup:
        t0 = time.time()
        service.warmup(defaults["sampler"], defaults["steps"], defaults["cfg_scale"])
        print(f"[serve] warmup compile done in {time.time() - t0:.1f}s", flush=True)
    if args.warmup_protocols:
        protos = json.loads(args.warmup_protocols)
        if not isinstance(protos, list):
            raise SystemExit("error: --warmup-protocols must be a JSON list")
        for proto in protos:
            t0 = time.time()
            p = dict(proto)
            sampler = p.pop("sampler", defaults["sampler"])
            steps = int(p.pop("steps", defaults["steps"]))
            cfg_scale = float(p.pop("cfg_scale", defaults["cfg_scale"]))
            if "cfg_interval" in p and p["cfg_interval"] is not None:
                p["cfg_interval"] = [float(v) for v in p["cfg_interval"]]
            service.warmup(sampler, steps, cfg_scale, **p)
            print(
                f"[serve] warmed {sampler}/{steps}/{cfg_scale:g} {p or ''} "
                f"in {time.time() - t0:.1f}s",
                flush=True,
            )

    server = ThreadingHTTPServer((args.host, args.port), make_handler(service, defaults))
    print(
        f"[serve] listening on http://{args.host}:{server.server_address[1]} "
        f"({service.info()['model']}, decode={service.info()['decode']})",
        flush=True,
    )

    # graceful SIGTERM (the standard container stop signal): finish in-flight
    # requests, stop accepting, exit 0
    import signal

    def _term(signum, frame):
        print("[serve] SIGTERM: shutting down", flush=True)
        import threading as _t

        _t.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        print("[serve] stopped", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000, help="0 = ephemeral")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ema-std", type=float, default=0.05)
    parser.add_argument("--use-vae", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--buckets", type=str, default="1,4,8",
                        help="batch buckets; requests pad to the next bucket "
                             "so every (sampler, steps, bucket) compiles once")
    parser.add_argument("--default-steps", type=int, default=20)
    parser.add_argument("--default-sampler", choices=["ddpm", "ddim", "dpm++", "unipc"],
                        default="dpm++")
    parser.add_argument("--default-cfg-scale", type=float, default=4.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-programs", type=int, default=32,
                        help="compile-budget cap on distinct (sampler, steps, "
                             "cfg_scale, bucket, schedule, cache_interval) "
                             "programs; new protocols past the cap are 400s "
                             "at admission")
    parser.add_argument("--max-pending", type=int, default=64,
                        help="pending-request cap; requests past it get an "
                             "immediate 503 + Retry-After instead of queueing "
                             "without bound")
    parser.add_argument("--request-timeout-s", type=float, default=600.0,
                        help="per-request deadline (504 on expiry; a still-"
                             "queued timed-out job is skipped, never run). "
                             "First use of a protocol pays its XLA compile — "
                             "keep this above compile time or pre-warm (0 = "
                             "no deadline)")
    parser.add_argument("--shard", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL",
                        help="shard divisible buckets over all chips (data-parallel)")
    parser.add_argument("--n-model", type=int, default=1,
                        help="tensor-parallel width: carve a 'model' axis out "
                             "of the fleet so every chain model call splits "
                             "its matmuls over it (GSPMD psums over ICI) — "
                             "the latency layout for buckets too small to "
                             "fill a data axis; must divide the device count")
    parser.add_argument("--preamble", choices=["host", "fused"], default="host",
                        help="request preamble: host = eager per-job key/z "
                             "device ops (the original seed contract); fused "
                             "= fold key derivation, z draws and CFG "
                             "doubling into the jitted chain — ONE device "
                             "dispatch per request (single-device servers; "
                             "changes seeded outputs, see SERVING.md)")
    parser.add_argument("--coalesce-ms", type=float, default=3.0,
                        help="how long the dispatcher waits to merge concurrent "
                             "same-protocol requests into one device batch "
                             "(0 = run each request immediately)")
    parser.add_argument("--warmup-protocols", type=str, default=None,
                        help='JSON list of protocol dicts to precompile at '
                             'startup, e.g. \'[{"steps": 20, "sampler": '
                             '"dpm++", "cfg_scale": 4.0, "cfg_interval": '
                             '[0.3, 3.0]}]\' — production protocols then '
                             'never pay a first-request compile (504 risk)')
    parser.add_argument("--warmup", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL")
    main(parser.parse_args())
