"""Progressive distillation (mapdit_tpu/diffusion/distill.py, distill.py).

The algebra tests pin the two-teacher-steps == one-student-step contract
against the REAL `GaussianDiffusion.ddim_sample` (not a re-derivation of
the update rule), including the final step to the alpha_bar=1 boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mapdit_tpu.diffusion.distill import (
    base_timestep_map,
    diffusion_from_map,
    distilled_map,
    halved_map,
    make_distill_losses,
    make_teacher_fn,
    student_diffusion_from_config,
    two_step_target,
)
from mapdit_tpu.models.dit import DiT, init_model
from mapdit_tpu.models.registry import build_config


# ----------------------------------------------------------------- grids


def test_grid_halving_nests_and_keeps_top():
    m0 = base_timestep_map(64)
    assert len(m0) == 64 and m0 == sorted(m0)
    m1 = halved_map(m0)
    assert len(m1) == 32
    assert set(m1) <= set(m0)
    assert m1[-1] == m0[-1]  # chain-start noise level preserved
    assert m1 == m0[1::2]
    # four rounds of nesting
    m = m0
    for r in range(1, 5):
        m = halved_map(m)
        assert m == distilled_map(64, r)
        assert set(m) <= set(m0)


def test_halving_odd_length_rejected():
    with pytest.raises(ValueError):
        halved_map(list(range(7)))


def test_karras_base_grid():
    m = base_timestep_map(16, schedule="karras")
    assert len(m) == 16 and m == sorted(m)


def test_diffusion_from_map_matches_tables():
    m = distilled_map(16, 1)
    d = diffusion_from_map(m)
    assert d.num_timesteps == 8
    assert list(np.asarray(d.timestep_map)) == m
    # acp at respaced index i must equal the ORIGINAL process acp at m[i]
    from mapdit_tpu.diffusion import create_diffusion

    full = create_diffusion("")
    np.testing.assert_allclose(
        np.asarray(d.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[np.asarray(m)],
        rtol=1e-6,
    )


def test_student_diffusion_from_config_roundtrip():
    args = {
        "distill_base_steps": 32,
        "distill_base_schedule": "uniform",
        "distill_rounds": 2,
    }
    d = student_diffusion_from_config(args)
    assert d.num_timesteps == 8
    assert list(np.asarray(d.timestep_map)) == distilled_map(32, 2)


# ------------------------------------------------------- target algebra


def _fake_teacher(x, t, y=None):
    """Smooth deterministic eps + zero var-logit, a stand-in model that is
    nonlinear in x and depends on the (original, float) timestep."""
    eps = 0.3 * jnp.tanh(x) + 0.002 * t.reshape(-1, 1, 1, 1)
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)


def test_two_step_target_identity():
    """One student DDIM step with pred_xstart == two_step_target lands
    exactly where two teacher DDIM steps land — at EVERY student index,
    including the final boundary step (a_s = 1)."""
    m_t = base_timestep_map(8)
    m_s = halved_map(m_t)
    d_t, d_s = diffusion_from_map(m_t), diffusion_from_map(m_s)

    key = jax.random.PRNGKey(0)
    n = d_s.num_timesteps  # one sample per student index
    x_t = jax.random.normal(key, (n, 2, 4, 4))
    i = jnp.arange(n, dtype=jnp.int32)
    kwargs = {"y": jnp.zeros((n,), jnp.int32)}

    target = two_step_target(d_t, d_s, _fake_teacher, x_t, i, kwargs)

    # student stub whose pred_xstart is exactly the target
    eps_implied = d_s._predict_eps_from_xstart(x_t, i, target)
    stub = lambda xx, tt, **kw: jnp.concatenate(
        [eps_implied, jnp.zeros_like(eps_implied)], axis=1
    )
    one = d_s.ddim_sample(
        stub, x_t, i, jax.random.PRNGKey(1), clip_denoised=False,
        model_kwargs=kwargs,
    )["sample"]

    # the teacher pair, straight through the real chain code
    u = 2 * i + 1
    o1 = d_t.ddim_sample(
        _fake_teacher, x_t, u, jax.random.PRNGKey(2), clip_denoised=False,
        model_kwargs=kwargs,
    )
    two = d_t.ddim_sample(
        _fake_teacher, o1["sample"], u - 1, jax.random.PRNGKey(3),
        clip_denoised=False, model_kwargs=kwargs,
    )["sample"]

    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=2e-5)


def test_distill_loss_zero_at_optimum():
    """A student that IS the implied-target predictor has (near) zero loss."""
    m_t = base_timestep_map(8)
    d_t, d_s = diffusion_from_map(m_t), diffusion_from_map(halved_map(m_t))
    key = jax.random.PRNGKey(4)
    n = 4
    x0 = jax.random.normal(key, (n, 2, 4, 4))
    t = jnp.arange(n, dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    kwargs = {"y": jnp.zeros((n,), jnp.int32)}

    x_t = d_s.q_sample(x0, t, noise)
    target = two_step_target(d_t, d_s, _fake_teacher, x_t, t, kwargs)
    eps_implied = d_s._predict_eps_from_xstart(x_t, t, target)
    stub = lambda xx, tt, **kw: jnp.concatenate(
        [eps_implied, jnp.zeros_like(eps_implied)], axis=1
    )
    losses = make_distill_losses(d_t, d_s, _fake_teacher)
    terms = losses(stub, x0, t, model_kwargs=kwargs, noise=noise)
    assert float(jnp.max(terms["loss"])) < 1e-8


# ------------------------------------------------------------ teacher fn


def _tiny_cfg(**kw):
    return build_config(
        "DiT-XS/8", in_channels=4, input_size=8, num_classes=4,
        compute_dtype="float32", **kw,
    )


def test_make_teacher_fn_cfg_combination():
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, seed=0)
    params, constants = variables["params"], variables.get("constants", {})
    n, w = 2, 2.5
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 4, 8, 8))
    t = jnp.full((n,), 500.0)
    y = jnp.array([1, 3], jnp.int32)

    plain = make_teacher_fn(model, params, constants, cfg.num_classes, 1.0)
    out = plain(x, t, y)
    ref = model.apply({"params": params, "constants": constants}, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    guided = make_teacher_fn(model, params, constants, cfg.num_classes, w)
    got = guided(x, t, y)
    y_null = jnp.full((n,), cfg.num_classes, jnp.int32)
    cond = model.apply({"params": params, "constants": constants}, x, t, y, train=False)
    unc = model.apply(
        {"params": params, "constants": constants}, x, t, y_null, train=False
    )
    eps_c, var_c = jnp.split(cond, 2, axis=1)
    eps_u, _ = jnp.split(unc, 2, axis=1)
    want = jnp.concatenate([eps_u + w * (eps_c - eps_u), var_c], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ------------------------------------------------------------ train step


def test_distill_train_step_learns():
    """Six jitted distill steps on a real (random-init) teacher: finite
    decreasing loss, finite grads, student stays on the WN manifold."""
    from mapdit_tpu.training import create_optimizer, create_train_state, make_train_step
    from mapdit_tpu.models.dit import project_weights

    cfg = _tiny_cfg()
    model, variables = init_model(cfg, seed=0)
    t_params, constants = variables["params"], variables.get("constants", {})

    m_t = base_timestep_map(8)
    d_t, d_s = diffusion_from_map(m_t), diffusion_from_map(halved_map(m_t))
    teacher_fn = make_teacher_fn(model, t_params, constants, cfg.num_classes, 1.5)
    losses_fn = make_distill_losses(d_t, d_s, teacher_fn)

    tx = create_optimizer(optax.constant_schedule(3e-4))
    state = create_train_state(cfg, tx, seed=1)
    state = state.replace(params=t_params, constants=constants)
    step = jax.jit(
        make_train_step(
            cfg, d_s, tx,
            stats_mean=jnp.zeros(4), stats_std=jnp.ones(4),
            losses_fn=losses_fn, model_train=False,
        ),
        donate_argnums=0,
    )

    # Deterministic held-out eval (fixed x0/t/noise covering every student
    # index): the per-STEP training losses are incomparable across steps
    # because the uniform t draw moves the SNR weight and discretization
    # gap by orders of magnitude — descent is asserted on the fixed probe.
    key = jax.random.PRNGKey(7)
    n_eval = 8
    # eval on the TRAINING x0/y (distillation fits the teacher map on the
    # data distribution; 12 steps need not generalize to unseen x0)
    eval_x0 = jax.random.normal(jax.random.fold_in(key, 3), (n_eval, 4, 8, 8))
    eval_y = jax.random.randint(jax.random.fold_in(key, 4), (n_eval,), 0, 4)
    eval_t = jnp.arange(n_eval, dtype=jnp.int32) % d_s.num_timesteps
    eval_noise = jax.random.normal(jax.random.fold_in(key, 2), eval_x0.shape)

    @jax.jit
    def eval_loss(params):
        def model_fn(xt, tt, y):
            return model.apply(
                {"params": params, "constants": constants}, xt, tt, y, train=False
            )

        terms = losses_fn(
            model_fn, eval_x0, eval_t, model_kwargs={"y": eval_y}, noise=eval_noise
        )
        return jnp.mean(terms["loss"])

    before = float(eval_loss(state.params))
    assert np.isfinite(before)
    batch0 = {"x": np.asarray(eval_x0), "y": np.asarray(eval_y)}
    for _ in range(12):
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch0.items()})
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
    after = float(eval_loss(state.params))
    assert np.isfinite(after)
    assert after < before, (before, after)
    # forced-WN projection still applied under the distill objective
    reproj = project_weights(state.params, cfg)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, reproj
    )
    assert max(jax.tree_util.tree_leaves(diff)) < 1e-5
