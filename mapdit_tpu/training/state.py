"""Train state and the fused jitted train step.

The reference's per-step work — loss forward/backward, Adam, LR schedule,
forced weight re-normalization, power-EMA lerp x2 stds
(`train.py:80-139`, `src/basic/mp_linear.py:38-40`, `src/ema.py:125-140`) —
is one XLA program here: ``train_step`` is jitted with the state donated, so
parameters, optimizer moments, and both EMA trees update in place on device
with zero host round-trips. VAE-posterior sampling + normalization
(reference does this in DataLoader workers, `train.py:168-176`) also happens
inside the step, so the host only feeds raw (mean, std, label) tensors.

Ordering parity (SURVEY.md §7 hard-part #1): grads are taken w.r.t. the
in-graph-normalized weights; Adam updates the stored (normalized) weights;
EMA lerps the *post-Adam, pre-projection* params (the reference calls
ema.update before the next forward's forced WN); projection then restores
the norm manifold for the next step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.models.dit import DiT, project_weights
from mapdit_tpu.training import ema as ema_lib

Array = jax.Array

EMA_STDS = (0.05, 0.1)  # reference default (train.py:54)


@struct.dataclass
class TrainState:
    step: Array
    params: Any
    constants: Any
    opt_state: Any
    ema: Dict[str, Any]  # "0.050" -> param pytree
    rng: Array
    # Importance-sampling state for --timestep-sampler loss-second-moment;
    # empty tuple when the uniform sampler is used.
    sampler_state: Any = ()


def ema_key(std: float) -> str:
    return f"{std:.3f}"


def create_optimizer(
    lr_schedule: Callable,
    b1: float = 0.9,
    b2: float = 0.99,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(0.9, 0.99) + schedule (reference `train.py:57`); optional global-
    norm gradient clipping (no reference equivalent — off by default)."""
    tx = optax.adam(learning_rate=lr_schedule, b1=b1, b2=b2)
    if grad_clip is not None and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(
    cfg: DiTConfig,
    tx: optax.GradientTransformation,
    seed: int = 0,
    ema_stds: Tuple[float, ...] = EMA_STDS,
    timestep_sampler: str = "uniform",
    num_timesteps: int = 1000,
) -> TrainState:
    from mapdit_tpu.models.dit import init_model

    _, variables = init_model(cfg, seed=seed)
    params = variables["params"]
    constants = variables.get("constants", {})
    sampler_state = ()
    if timestep_sampler == "loss-second-moment":
        from mapdit_tpu.diffusion.timestep_sampler import LossSecondMomentResampler

        sampler_state = LossSecondMomentResampler(num_timesteps).init_state()
    return TrainState(
        sampler_state=sampler_state,
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
        # Distinct buffers per EMA tree: aliasing params would make the
        # donated train-step state donate the same buffer multiple times.
        ema={
            ema_key(s): jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)
            for s in ema_stds
        },
        rng=jax.random.PRNGKey(seed),
    )


def make_train_step(
    cfg: DiTConfig,
    diffusion,
    tx: optax.GradientTransformation,
    stats_mean: Optional[Array] = None,
    stats_std: Optional[Array] = None,
    ema_stds: Tuple[float, ...] = EMA_STDS,
    timestep_sampler: str = "uniform",
    sampler_axis_name: Optional[str] = None,
    grad_accum: int = 1,
    grad_shardings: Any = None,
    losses_fn: Optional[Callable] = None,
    model_train: bool = True,
):
    """Build the pure train-step function (jit/donate applied by the caller
    or `mapdit_tpu.training.train_loop`).

    Batch formats:
      {"x": (N,C,H,W), "y": (N,)}                      — pre-sampled latents
      {"mean": ..., "std": ..., "y": ...}              — VAE posterior params;
        a fresh latent mu + eps*sigma is drawn and normalized on device every
        step (the reference's stochastic posterior augmentation,
        `train.py:168-176`).

    ``grad_accum > 1`` splits the (global) batch into that many equal
    micro-batches and runs them through a `lax.scan`, averaging gradients
    before the single Adam/EMA/projection update — activation memory drops
    to one micro-batch while the optimizer trajectory is **exactly** the
    unaccumulated one: per-row t, q-sample noise, and importance weights are
    drawn for the full batch up front (identical RNG stream), and the mean
    of equal-size micro-batch gradients equals the full-batch gradient.
    (Only the CFG label-dropout mask derivation differs per micro-batch —
    same marginal distribution.)

    ``grad_shardings`` (a pytree of NamedShardings matching the params, i.e.
    the `param_sharding(..., fsdp=...)` layout) pins the per-micro-batch
    gradients inside the accumulation scan to the parameter layout. Without
    it, GSPMD leaves the backward-dot outputs in their natural (transposed)
    tiling and must involuntarily fully rematerialize them at the scan-carry
    boundary every iteration (spmd_partitioner.cc warnings); the constraint
    moves the reduce-scatter to the dot. No-op semantics — only the
    collective placement changes. (A handful of forward weight-transpose
    reshard warnings can remain on a pure-FSDP mesh inside the scan — those
    are the per-layer weight all-gathers FSDP requires anyway, expressed
    inefficiently by the pre-Shardy partitioner; tracked upstream as
    b/433785288.)

    ``losses_fn`` swaps the per-sample objective: any callable with
    `diffusion.training_losses`'s signature (model_fn, x, t, model_kwargs,
    noise) -> {"loss": per_sample, ...}. Used by progressive distillation
    (`mapdit_tpu/diffusion/distill.py`); ``diffusion`` then only provides
    num_timesteps for the uniform t draw. ``model_train=False`` calls the
    model without CFG label dropout (guided distillation bakes the
    conditioning, so dropping labels would corrupt the target pairing) —
    the flag only gates the dropout branch, nothing else keys on it.
    """
    model = DiT(cfg)
    beta_fns = {ema_key(s): ema_lib.make_beta_fn(s) for s in ema_stds}
    assert grad_accum >= 1

    resampler = None
    if timestep_sampler == "loss-second-moment":
        from mapdit_tpu.diffusion.timestep_sampler import LossSecondMomentResampler

        resampler = LossSecondMomentResampler(diffusion.num_timesteps)
    elif timestep_sampler != "uniform":
        raise ValueError(f"unknown timestep sampler {timestep_sampler!r}")

    def train_step(state: TrainState, batch: Dict[str, Array]):
        rng, rng_noise, rng_t, rng_drop, rng_post = jax.random.split(state.rng, 5)

        y = batch["y"]
        if "x" in batch:
            x = batch["x"]
        else:
            eps = jax.random.normal(rng_post, batch["mean"].shape, batch["mean"].dtype)
            x = batch["mean"] + eps * batch["std"]
            x = (x - stats_mean.reshape(1, -1, 1, 1)) / stats_std.reshape(1, -1, 1, 1)

        n = x.shape[0]
        if resampler is None:
            # Uniform t ~ randint (reference train.py:86)
            t = jax.random.randint(rng_t, (n,), 0, diffusion.num_timesteps)
            t_weights = None
        else:
            t, t_weights = resampler.sample(state.sampler_state, rng_t, n)
        # Pre-drawn q-sample noise: identical values to training_losses's
        # internal draw for grad_accum=1, sliceable per micro-batch otherwise.
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)

        def make_loss_fn(xb, yb, tb, nb, wb, drop_rng):
            def loss_fn(params):
                def model_fn(xt, tt, y):
                    return model.apply(
                        {"params": params, "constants": state.constants},
                        xt,
                        tt,
                        y,
                        train=model_train,
                        rngs={"label_dropout": drop_rng},
                    )

                terms = (losses_fn or diffusion.training_losses)(
                    model_fn, xb, tb, model_kwargs={"y": yb}, noise=nb
                )
                per_sample = terms["loss"]
                if wb is not None:
                    per_sample = per_sample * wb
                return jnp.mean(per_sample), terms

            return loss_fn

        if grad_accum == 1:
            (loss, terms), grads = jax.value_and_grad(
                make_loss_fn(x, y, t, noise, t_weights, rng_drop), has_aux=True
            )(state.params)
            per_sample_loss = terms["loss"]
            mse = jnp.mean(terms["mse"]) if "mse" in terms else loss
            vb = jnp.mean(terms["vb"]) if "vb" in terms else jnp.zeros(())
        else:
            assert n % grad_accum == 0, (n, grad_accum)
            m = n // grad_accum
            split = lambda a: a.reshape(grad_accum, m, *a.shape[1:])
            xs = (
                split(x),
                split(y),
                split(t),
                split(noise),
                split(t_weights) if t_weights is not None else None,
                jnp.arange(grad_accum),
            )
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            if grad_shardings is not None:
                zero_grads = jax.lax.with_sharding_constraint(
                    zero_grads, grad_shardings
                )

            def body(carry, inp):
                g_acc, loss_acc, mse_acc, vb_acc = carry
                xb, yb, tb, nb, wb, i = inp
                (l, terms), g = jax.value_and_grad(
                    make_loss_fn(xb, yb, tb, nb, wb, jax.random.fold_in(rng_drop, i)),
                    has_aux=True,
                )(state.params)
                if grad_shardings is not None:
                    g = jax.lax.with_sharding_constraint(g, grad_shardings)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                mse_b = jnp.mean(terms["mse"]) if "mse" in terms else l
                vb_b = jnp.mean(terms["vb"]) if "vb" in terms else jnp.zeros(())
                return (
                    (g_acc, loss_acc + l, mse_acc + mse_b, vb_acc + vb_b),
                    jax.lax.stop_gradient(terms["loss"]),
                )

            (g_sum, loss_sum, mse_sum, vb_sum), micro_losses = jax.lax.scan(
                body, (zero_grads, jnp.zeros(()), jnp.zeros(()), jnp.zeros(())), xs
            )
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda a: a * inv, g_sum)
            loss, mse, vb = loss_sum * inv, mse_sum * inv, vb_sum * inv
            per_sample_loss = micro_losses.reshape(n)

        sampler_state = state.sampler_state
        if resampler is not None:
            sampler_state = resampler.update_with_local_losses(
                sampler_state,
                t,
                jax.lax.stop_gradient(per_sample_loss),
                axis_name=sampler_axis_name,
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA sees post-Adam, pre-projection params (reference ordering);
        # beta is computed from the 1-indexed step so step 1 copies the model.
        step1 = state.step + 1
        new_ema = {
            k: ema_lib.ema_update(state.ema[k], params, beta_fns[k](step1))
            for k in state.ema
        }

        params = project_weights(params, cfg)

        metrics = {
            "loss": loss,
            "mse": mse,
            "vb": vb,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(
            step=step1,
            params=params,
            constants=state.constants,
            opt_state=opt_state,
            ema=new_ema,
            rng=rng,
            sampler_state=sampler_state,
        )
        return new_state, metrics

    return train_step
