"""Importance sampling over diffusion timesteps (functional).

Port of the reference's public API surface `diffusion/timestep_sampler.py`
(unused by its entry points — SURVEY.md §2.6 — but part of the diffusion
library): UniformSampler and LossSecondMomentResampler. The reference's
cross-rank `torch.distributed.all_gather` sync (`timestep_sampler.py:82-103`)
becomes `jax.lax.all_gather` over the data-parallel mesh axis when an
``axis_name`` is supplied inside a shard_map/jit region; single-process use
needs no sync at all.

States are plain pytrees so they live inside the jitted train step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class UniformSampler:
    """Uniform t ~ U{0, T-1}, unit weights (reference `:62-68`)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def weights(self) -> Array:
        return jnp.ones((self.num_timesteps,), jnp.float32)

    def sample(self, rng: Array, batch_size: int) -> Tuple[Array, Array]:
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        return t, jnp.ones((batch_size,), jnp.float32)


@struct.dataclass
class LossHistoryState:
    """Rolling per-timestep loss history: (T, H) ring buffer + counts."""

    history: Array  # (T, H) float32
    counts: Array  # (T,) int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10) -> "LossHistoryState":
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


class LossSecondMomentResampler:
    """p(t) ∝ sqrt(E[loss_t^2]) importance sampling (reference `:120-150`)."""

    def __init__(
        self,
        num_timesteps: int,
        history_per_term: int = 10,
        uniform_prob: float = 0.001,
    ):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> LossHistoryState:
        return LossHistoryState.create(self.num_timesteps, self.history_per_term)

    def weights(self, state: LossHistoryState) -> Array:
        warmed = jnp.all(state.counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(jnp.square(state.history), axis=-1))
        w = w / jnp.sum(w)
        w = w * (1.0 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return jnp.where(warmed, w, jnp.ones((self.num_timesteps,)) / self.num_timesteps)

    def sample(
        self, state: LossHistoryState, rng: Array, batch_size: int
    ) -> Tuple[Array, Array]:
        p = self.weights(state)
        p = p / jnp.sum(p)
        t = jax.random.choice(rng, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights.astype(jnp.float32)

    def update_with_local_losses(
        self,
        state: LossHistoryState,
        ts: Array,
        losses: Array,
        axis_name: Optional[str] = None,
    ) -> LossHistoryState:
        """Fold a batch of (t, loss) pairs into the ring buffer.

        With ``axis_name`` (inside shard_map/jit over the data mesh axis),
        every shard's pairs are all-gathered first so all ranks evolve an
        identical state — the reference's `dist.all_gather` contract.
        """
        if axis_name is not None:
            ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
            losses = jax.lax.all_gather(losses, axis_name).reshape(-1)

        def fold(carry, tl):
            history, counts = carry
            t, loss = tl
            t = t.astype(jnp.int32)
            cnt = counts[t]
            row = history[t]
            # ring: shift out the oldest when full, else append at cnt
            full = cnt == self.history_per_term
            shifted = jnp.concatenate([row[1:], jnp.array([loss])])
            appended = row.at[jnp.minimum(cnt, self.history_per_term - 1)].set(loss)
            new_row = jnp.where(full, shifted, appended)
            history = history.at[t].set(new_row)
            counts = counts.at[t].set(jnp.minimum(cnt + 1, self.history_per_term))
            return (history, counts), None

        (history, counts), _ = jax.lax.scan(
            fold,
            (state.history, state.counts),
            (ts.astype(jnp.int32), losses.astype(jnp.float32)),
        )
        return LossHistoryState(history=history, counts=counts)
