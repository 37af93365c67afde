#!/usr/bin/env python
"""Train-step decomposition probe (device-resident data).

BASELINE.md names train steps/sec the primary tracked metric, and the
resident-data S/2 b256 step runs at ~38% MFU vs the sampling chain's 58%
— but the loss has never been attributed. This probe times four jitted
variants of the same step and attributes by differences:

  fwd        loss value only (XLA DCEs the backward)
  grad       loss + grads (forced via optax.global_norm)
  grad+adam  grads -> Adam update (no EMA, no weight projection)
  full       the real make_train_step (Adam + 2-std EMA + projection)

so  bwd = grad - fwd,  adam = (grad+adam) - grad,
    ema+projection = full - (grad+adam).

Caveats: differences are serialized-time savings (stages that overlap
dispatch show less); one TPU process at a time (axon relay).

  python tools/train_probe.py --batch 256 --steps 30
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="DiT-S/2")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from mapdit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from mapdit_tpu.diffusion import create_diffusion
    from mapdit_tpu.models import build_config
    from mapdit_tpu.models.dit import DiT
    from mapdit_tpu.training import (
        create_optimizer,
        create_train_state,
        make_train_step,
        warmup_flat_invsqrt,
    )
    from mapdit_tpu.training.data import SyntheticLatentDataset
    from mapdit_tpu.training.state import project_weights

    cfg = build_config(
        args.model, in_channels=4, input_size=16, num_classes=1000,
        compute_dtype=args.dtype,
    )
    diffusion = create_diffusion("")
    ds = SyntheticLatentDataset(num_examples=max(1024, 2 * args.batch),
                                num_classes=1000)
    tx = create_optimizer(warmup_flat_invsqrt(1e-2, 100, 1000))
    state = create_train_state(cfg, tx, seed=0)
    batch = {k: jax.device_put(jnp.asarray(v))
             for k, v in next(ds.batches(batch_size=args.batch, seed=0)).items()}
    mean = jnp.asarray(ds.stats["mean"]).reshape(1, -1, 1, 1)
    std = jnp.asarray(ds.stats["std"]).reshape(1, -1, 1, 1)
    model = DiT(cfg)
    import optax

    # the same per-step math as make_train_step's loss (uniform t sampler,
    # pre-drawn noise, label-dropout rng), minus the update tiers
    def loss_of(params, constants, rng):
        rng_noise, rng_t, rng_drop, rng_post = jax.random.split(rng, 4)
        eps = jax.random.normal(rng_post, batch["mean"].shape, batch["mean"].dtype)
        x = (batch["mean"] + eps * batch["std"] - mean) / std
        t = jax.random.randint(rng_t, (x.shape[0],), 0, diffusion.num_timesteps)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)

        def model_fn(xt, tt, y):
            return model.apply(
                {"params": params, "constants": constants}, xt, tt, y,
                train=True, rngs={"label_dropout": rng_drop},
            )

        terms = diffusion.training_losses(
            model_fn, x, t, model_kwargs={"y": batch["y"]}, noise=noise
        )
        return jnp.mean(terms["loss"])

    @jax.jit
    def fwd(params, constants, rng):
        return loss_of(params, constants, rng)

    @jax.jit
    def grad(params, constants, rng):
        l, g = jax.value_and_grad(loss_of)(params, constants, rng)
        return l, optax.global_norm(g)

    # donate params/opt_state like the full step does (donate_argnums=0 on
    # the whole TrainState) — without it XLA copies the 3x-param optimizer
    # state every call and the comparison reads ~4 ms slower than the full
    # step (measured; the first probe run had exactly that artifact)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def grad_adam(params, opt_state, constants, rng):
        l, g = jax.value_and_grad(loss_of)(params, constants, rng)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l, optax.global_norm(g)

    full_step = jax.jit(
        make_train_step(cfg, diffusion, tx,
                        stats_mean=jnp.asarray(ds.stats["mean"]),
                        stats_std=jnp.asarray(ds.stats["std"])),
        donate_argnums=0,
    )

    def time_it(fn, *a, n=args.steps):
        out = fn(*a)
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - start) / n * 1e3  # ms/step

    rng = jax.random.PRNGKey(0)
    t_fwd = time_it(fwd, state.params, state.constants, rng)
    t_grad = time_it(grad, state.params, state.constants, rng)

    # donated args must thread through the loop (the input buffers die)
    p, o = jax.tree_util.tree_map(jnp.copy, (state.params, state.opt_state))
    p, o, l, _ = grad_adam(p, o, state.constants, rng)
    jax.block_until_ready(l)
    start = time.perf_counter()
    for _ in range(args.steps):
        p, o, l, _ = grad_adam(p, o, state.constants, rng)
    jax.block_until_ready(l)
    t_ga = (time.perf_counter() - start) / args.steps * 1e3

    # full step must thread state (donated); time the real loop shape
    s = state
    s, m = full_step(s, batch)
    jax.block_until_ready(m["loss"])
    start = time.perf_counter()
    for _ in range(args.steps):
        s, m = full_step(s, batch)
    jax.block_until_ready(m["loss"])
    t_full = (time.perf_counter() - start) / args.steps * 1e3

    rows = [
        ("fwd (loss only)", t_fwd, None),
        ("grad (fwd+bwd)", t_grad, f"bwd = {t_grad - t_fwd:.2f}"),
        ("grad+adam", t_ga, f"adam = {t_ga - t_grad:.2f}"),
        ("full step", t_full, f"ema+projection = {t_full - t_ga:.2f}"),
    ]
    print(f"\n{args.model} batch {args.batch} {args.dtype} resident-data, "
          f"{args.steps} timed steps (ms/step):")
    for name, ms, attr in rows:
        print(f"  {name:<16} {ms:8.2f}" + (f"   {attr} ms" if attr else ""))
    print(f"  train steps/s (full): {1e3 / t_full:.1f}")


if __name__ == "__main__":
    main()
