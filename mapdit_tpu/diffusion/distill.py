"""Progressive distillation (Salimans & Ho, arXiv 2202.00512) — TPU-native.

Halve the sampling-step count of a trained DiT repeatedly: at each stage a
student (initialized from the teacher) learns to reproduce TWO teacher DDIM
steps with ONE of its own. The reference has no distillation tier at all —
its few-step story ends at timestep respacing (`/root/reference/diffusion/
respace.py:12-62`); this module is the production low-latency path on top
of the same respaced-grid machinery (`mapdit_tpu/diffusion/respace.py`).

Grid construction keeps every stage a *nested* subset so teacher/student
steps align exactly:

  M_0 = uniform-section (or Karras) subset of the 1000-step process
  M_{k+1} = M_k[1::2]     (every other point, top timestep always kept;
                           requires even |M_k|)

With ascending maps, the student diffusion built on M_{k+1} has
``acp_student[i] = acp_teacher[2i+1]`` and
``acp_prev_student[i] = acp_prev_teacher[2i]`` — the student step at
respaced index i spans exactly the teacher pair (2i+1, 2i), including the
final step to the ``alpha_bar_prev = 1`` boundary (gaussian.py's DDIM
convention). tests/test_distill.py pins this against the real
`ddim_sample`, not a re-derivation.

The loss is the paper's x0-space regression with truncated-SNR weighting
``w = max(acp/(1-acp), 1)`` (their eq. 10 / appendix E: plain eps-loss
collapses at high noise where x0-weight -> 0). Classifier-free guidance can
be BAKED INTO the student at a fixed scale (guided distillation, Meng et
al. arXiv 2210.03142 stage-2 form): the teacher target uses the CFG-combined
eps, and the distilled student samples conditionally WITHOUT batch doubling.

Everything here is static-shape, scan/jit-friendly: the teacher pair is two
fixed model calls inside the jitted train step; no data-dependent control
flow anywhere.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.diffusion import gaussian as gd
from mapdit_tpu.diffusion.dmath import mean_flat
from mapdit_tpu.diffusion.gaussian import GaussianDiffusion
from mapdit_tpu.diffusion.respace import (
    karras_timesteps,
    respaced_betas,
    space_timesteps,
)
from mapdit_tpu.diffusion.schedules import get_named_beta_schedule

Array = jax.Array


# --------------------------------------------------------------------- grids


def base_timestep_map(
    base_steps: int,
    schedule: str = "uniform",
    diffusion_steps: int = 1000,
    noise_schedule: str = "linear",
) -> List[int]:
    """Stage-0 grid M_0: ascending original-timestep subset."""
    if schedule == "karras":
        betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
        steps = karras_timesteps(betas, base_steps)
    else:
        steps = space_timesteps(diffusion_steps, str(base_steps))
    m = sorted(steps)
    assert len(m) == base_steps, (len(m), base_steps)
    return m


def halved_map(m: Sequence[int]) -> List[int]:
    """M -> M[1::2]: every other point keeping the TOP timestep (ascending
    maps, even length — odd lengths would drop the chain-start noise level)."""
    m = list(m)
    if len(m) % 2 != 0:
        raise ValueError(
            f"cannot halve an odd-length grid ({len(m)} steps); pick "
            "--base-steps divisible by 2**stages"
        )
    return m[1::2]


def distilled_map(
    base_steps: int,
    rounds: int,
    schedule: str = "uniform",
    diffusion_steps: int = 1000,
) -> List[int]:
    m = base_timestep_map(base_steps, schedule, diffusion_steps)
    for _ in range(rounds):
        m = halved_map(m)
    return m


def diffusion_from_map(
    m: Sequence[int], diffusion_steps: int = 1000, noise_schedule: str = "linear"
) -> GaussianDiffusion:
    """A sampling/distillation process on an explicit timestep subset
    (same table construction as `create_diffusion`, which only accepts
    respacing *strings*)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    new_betas, timestep_map = respaced_betas(betas, set(m))
    return GaussianDiffusion.create(
        new_betas,
        mean_type=gd.EPSILON,
        var_type=gd.LEARNED_RANGE,
        loss_type=gd.MSE,
        timestep_map=timestep_map,
        original_num_steps=diffusion_steps,
    )


def student_diffusion_from_config(train_args: dict) -> GaussianDiffusion:
    """Rebuild a distilled experiment's sampling grid from its config.yaml
    (fields written by distill.py: distill_base_steps / distill_base_schedule
    / distill_rounds)."""
    m = distilled_map(
        int(train_args["distill_base_steps"]),
        int(train_args["distill_rounds"]),
        train_args.get("distill_base_schedule", "uniform"),
    )
    return diffusion_from_map(m)


# --------------------------------------------------------------------- loss


def make_teacher_fn(
    model,
    teacher_params,
    teacher_constants,
    num_classes: int,
    cfg_scale: float = 1.0,
):
    """Frozen-teacher eps+var prediction, optionally CFG-combined at a fixed
    scale (guided distillation): eps = eps_u + w*(eps_c - eps_u), variance
    head from the conditional pass (the `forward_with_cfg` convention,
    reference src/models.py)."""

    def teacher_fn(x: Array, t: Array, y: Array) -> Array:
        variables = {"params": teacher_params, "constants": teacher_constants}
        if cfg_scale == 1.0:
            return model.apply(variables, x, t, y, train=False)
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        yy = jnp.concatenate([y, jnp.full_like(y, num_classes)], axis=0)
        out = model.apply(variables, xx, tt, yy, train=False)
        cond, uncond = jnp.split(out, 2, axis=0)
        eps_c, var_c = jnp.split(cond, 2, axis=1)
        eps_u, _ = jnp.split(uncond, 2, axis=1)
        eps = eps_u + cfg_scale * (eps_c - eps_u)
        return jnp.concatenate([eps, var_c], axis=1)

    return teacher_fn


def two_step_target(
    d_teacher: GaussianDiffusion,
    d_student: GaussianDiffusion,
    teacher_fn,
    x_t: Array,
    i: Array,
    model_kwargs: Optional[dict] = None,
) -> Array:
    """The x0 the student must predict at student index ``i`` so that one
    student DDIM step from x_t lands exactly where two teacher DDIM steps
    land (Salimans & Ho eq. 8, in gaussian.py's table conventions).

    Solving ``x'' = sqrt(a_s) x~0 + sqrt((1-a_s)/(1-a_t)) (x_t - sqrt(a_t)
    x~0)`` for x~0; at the final step (a_s = 1) this degrades to
    ``x~0 = x''`` exactly.
    """
    assert 2 * d_student.num_timesteps == d_teacher.num_timesteps
    frozen = lambda xx, tt, **kw: jax.lax.stop_gradient(teacher_fn(xx, tt, **kw))
    key0 = jax.random.PRNGKey(0)  # eta=0: the DDIM noise branch multiplies by 0
    u = 2 * i + 1
    o1 = d_teacher.ddim_sample(
        frozen, x_t, u, key0, clip_denoised=False, model_kwargs=model_kwargs
    )
    o2 = d_teacher.ddim_sample(
        frozen, o1["sample"], u - 1, key0, clip_denoised=False,
        model_kwargs=model_kwargs,
    )
    nd = x_t.ndim
    a_t = d_student._extract(d_student.alphas_cumprod, i, nd)
    a_s = d_student._extract(d_student.alphas_cumprod_prev, i, nd)
    c = jnp.sqrt((1.0 - a_s) / (1.0 - a_t))
    denom = jnp.sqrt(a_s) - c * jnp.sqrt(a_t)
    return jax.lax.stop_gradient((o2["sample"] - c * x_t) / denom)


def make_distill_losses(
    d_teacher: GaussianDiffusion,
    d_student: GaussianDiffusion,
    teacher_fn,
):
    """A drop-in replacement for ``diffusion.training_losses`` (the
    ``losses_fn`` hook of `make_train_step`): per-sample truncated-SNR x0
    regression against the two-teacher-step target. ``t`` is the STUDENT
    respaced index in [0, d_student.num_timesteps)."""

    def distill_losses(
        model_fn, x_start: Array, t: Array, model_kwargs=None, noise=None
    ) -> Dict[str, Array]:
        if noise is None:
            raise ValueError("distill_losses requires pre-drawn noise")
        x_t = d_student.q_sample(x_start, t, noise)
        x0_target = two_step_target(
            d_teacher, d_student, teacher_fn, x_t, t, model_kwargs
        )
        out = d_student.p_mean_variance(
            model_fn, x_t, t, clip_denoised=False, model_kwargs=model_kwargs
        )
        nd = x_t.ndim
        a_t = d_student._extract(d_student.alphas_cumprod, t, nd)
        w = jnp.maximum(a_t / (1.0 - a_t), 1.0)  # truncated SNR
        loss = mean_flat(w * (x0_target - out["pred_xstart"]) ** 2)
        return {"loss": loss, "mse": loss}

    return distill_losses
