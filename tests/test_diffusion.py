"""Diffusion golden-parity + sampler equivalence tests (SURVEY.md §4.3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion, gd, respaced_betas, space_timesteps
from mapdit_tpu.diffusion.schedules import get_named_beta_schedule

TOL = dict(rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def diff():
    return create_diffusion("")


class TestTables:
    def test_beta_schedules(self, golden):
        g = golden("diffusion")
        np.testing.assert_allclose(
            get_named_beta_schedule("linear", 1000), g["betas"], rtol=1e-12
        )
        np.testing.assert_allclose(
            get_named_beta_schedule("squaredcos_cap_v2", 1000),
            g["cosine_betas"],
            rtol=1e-12,
        )

    def test_coefficient_tables(self, golden, diff):
        g = golden("diffusion")
        for name in [
            "betas",
            "alphas_cumprod",
            "alphas_cumprod_prev",
            "sqrt_alphas_cumprod",
            "sqrt_one_minus_alphas_cumprod",
            "sqrt_recip_alphas_cumprod",
            "sqrt_recipm1_alphas_cumprod",
            "posterior_variance",
            "posterior_log_variance_clipped",
            "posterior_mean_coef1",
            "posterior_mean_coef2",
        ]:
            np.testing.assert_allclose(
                np.asarray(getattr(diff, name)),
                g[name].astype(np.float32),
                rtol=2e-5,
                err_msg=name,
            )

    def test_respacing(self, golden):
        g = golden("diffusion")
        np.testing.assert_array_equal(
            np.array(sorted(space_timesteps(1000, "250"))), g["space_250"]
        )
        np.testing.assert_array_equal(
            np.array(sorted(space_timesteps(1000, "ddim25"))), g["space_ddim25"]
        )
        d250 = create_diffusion("250")
        np.testing.assert_allclose(np.asarray(d250.betas), g["betas_250"], rtol=2e-5)
        np.testing.assert_array_equal(np.asarray(d250.timestep_map), g["timestep_map_250"])
        dddim = create_diffusion("ddim25")
        np.testing.assert_allclose(np.asarray(dddim.betas), g["betas_ddim25"], rtol=2e-5)
        np.testing.assert_array_equal(
            np.asarray(dddim.timestep_map), g["timestep_map_ddim25"]
        )

    def test_karras_timesteps(self):
        from mapdit_tpu.diffusion import karras_timesteps

        betas = get_named_beta_schedule("linear", 1000)
        for n in (1, 2, 10, 20, 250):
            ks = sorted(karras_timesteps(betas, n))
            assert len(ks) == n and len(set(ks)) == n
            assert all(0 <= t < 1000 for t in ks)
        ks = sorted(karras_timesteps(betas, 20))
        # includes both endpoints; denser at low noise than uniform spacing
        assert ks[0] == 0 and ks[-1] == 999
        assert sum(1 for t in ks if t < 250) > 20 * 250 // 1000
        # full-coverage degenerate case
        assert karras_timesteps(betas, 1000) == set(range(1000))
        # the respaced process built on it is well-formed
        d = create_diffusion("karras20")
        assert d.num_timesteps == 20
        tm = np.asarray(d.timestep_map)
        assert (np.diff(tm) > 0).all() and tm[0] == 0 and tm[-1] == 999

    def test_multi_section_respacing(self):
        steps = space_timesteps(300, [10, 15, 20])
        assert len(steps) == 45
        assert min(steps) == 0 and max(steps) < 300


class TestProcessGolden:
    def test_q_sample(self, golden, diff):
        g = golden("diffusion")
        xt = diff.q_sample(jnp.asarray(g["x0"]), jnp.asarray(g["t"], jnp.int32), jnp.asarray(g["noise"]))
        np.testing.assert_allclose(np.asarray(xt), g["xt"], rtol=2e-5, atol=1e-5)

    def test_p_mean_variance(self, golden, diff):
        g = golden("diffusion")
        model_fn = lambda x, t, **kw: jnp.asarray(g["model_out"])
        t = jnp.asarray(g["t"], jnp.int32)
        out = diff.p_mean_variance(model_fn, jnp.asarray(g["xt"]), t, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(out["mean"]), g["pmv_mean"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["variance"]), g["pmv_var"], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["log_variance"]), g["pmv_logvar"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]), g["pmv_xstart"], rtol=1e-4, atol=1e-4)

        out_c = diff.p_mean_variance(model_fn, jnp.asarray(g["xt"]), t, clip_denoised=True)
        np.testing.assert_allclose(np.asarray(out_c["mean"]), g["pmv_clip_mean"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_c["pred_xstart"]), g["pmv_clip_xstart"], rtol=1e-4, atol=1e-5)

    def test_p_mean_variance_respaced(self, golden):
        g = golden("diffusion")
        d250 = create_diffusion("250")
        model_fn = lambda x, t, **kw: jnp.asarray(g["model_out"])
        out = d250.p_mean_variance(
            model_fn, jnp.asarray(g["xt"]), jnp.asarray(g["t_sub"], jnp.int32), clip_denoised=False
        )
        np.testing.assert_allclose(np.asarray(out["mean"]), g["pmv250_mean"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["log_variance"]), g["pmv250_logvar"], rtol=1e-4, atol=1e-5)

    def test_training_losses(self, golden, diff):
        g = golden("diffusion")
        model_fn = lambda x, t, **kw: jnp.asarray(g["model_out"])
        terms = diff.training_losses(
            model_fn,
            jnp.asarray(g["x0"]),
            jnp.asarray(g["t"], jnp.int32),
            noise=jnp.asarray(g["noise"]),
        )
        np.testing.assert_allclose(np.asarray(terms["mse"]), g["loss_mse"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(terms["vb"]), g["loss_vb"], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(terms["loss"]), g["loss"], rtol=1e-3, atol=1e-4)


class TestSamplers:
    """Scan sampler vs per-step Python loop on a tiny analytic model."""

    @staticmethod
    def _model(x, t, **kw):
        # deterministic pseudo-model: eps-hat and var values from x
        return jnp.concatenate([0.1 * x, jnp.tanh(x)], axis=1)

    def test_scan_matches_python_loop(self):
        d = create_diffusion("10")
        rng = jax.random.PRNGKey(0)
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))

        scan_out = d.p_sample_loop(self._model, noise, rng, clip_denoised=False)

        x, key = noise, rng
        for i in reversed(range(d.num_timesteps)):
            key, step_key = jax.random.split(key)
            t = jnp.full((2,), i, jnp.int32)
            x = d.p_sample(self._model, x, t, step_key, clip_denoised=False)["sample"]
        np.testing.assert_allclose(np.asarray(scan_out), np.asarray(x), rtol=1e-5, atol=1e-5)

    def test_progressive_matches_final(self):
        d = create_diffusion("5")
        rng = jax.random.PRNGKey(0)
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        final = d.p_sample_loop(self._model, noise, rng, clip_denoised=False)
        prog = d.p_sample_loop_progressive(self._model, noise, rng, clip_denoised=False)
        assert prog["sample"].shape == (5, 2, 4, 8, 8)
        np.testing.assert_allclose(np.asarray(prog["sample"][-1]), np.asarray(final), rtol=1e-6)

    def test_ddim_deterministic(self):
        d = create_diffusion("ddim10")
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        a = d.ddim_sample_loop(self._model, noise, jax.random.PRNGKey(0), clip_denoised=False)
        b = d.ddim_sample_loop(self._model, noise, jax.random.PRNGKey(7), clip_denoised=False)
        # eta=0 => no stochasticity => rng must not matter
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        assert np.isfinite(np.asarray(a)).all()

    def test_respaced_full_consistency(self):
        """A 1000-step process respaced to all 1000 steps is the identity
        respacing: identical tables."""
        full = create_diffusion("")
        same = create_diffusion("1000")
        np.testing.assert_allclose(np.asarray(full.betas), np.asarray(same.betas), rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(full.timestep_map), np.asarray(same.timestep_map)
        )

    def test_calc_bpd_loop_shapes(self):
        d = create_diffusion("5")
        x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8)) * 0.1
        out = d.calc_bpd_loop(self._model, x0, jax.random.PRNGKey(3))
        assert out["vb"].shape == (2, 5)
        assert out["total_bpd"].shape == (2,)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()


class TestModeVariants:
    """The non-default factory modes (learn_sigma off, predict_xstart,
    use_kl, rescaled sigmas) — API-surface parity with create_diffusion."""

    @staticmethod
    def _eps_model(x, t, **kw):
        return 0.1 * x

    def test_fixed_small_and_large(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([5, 900])
        for sigma_small in (True, False):
            d = create_diffusion("", learn_sigma=False, sigma_small=sigma_small)
            out = d.p_mean_variance(self._eps_model, x, t, clip_denoised=False)
            expect = (
                d.posterior_variance if sigma_small else d.fixed_large_variance
            )
            np.testing.assert_allclose(
                np.asarray(out["variance"][:, 0, 0, 0]),
                np.asarray(expect[t]),
                rtol=1e-6,
            )
            terms = d.training_losses(
                self._eps_model, x, t, noise=jnp.zeros_like(x)
            )
            assert "vb" not in terms  # pure MSE when variance is fixed
            np.testing.assert_allclose(
                np.asarray(terms["loss"]), np.asarray(terms["mse"]), rtol=1e-6
            )

    def test_predict_xstart(self):
        d = create_diffusion("", predict_xstart=True, learn_sigma=False)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([10, 500])
        model = lambda x, tt, **kw: x0  # model directly predicts x0
        out = d.p_mean_variance(model, d.q_sample(x0, t, jnp.zeros_like(x0)), t, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0), rtol=1e-5)
        # mse target is x_start
        terms = d.training_losses(model, x0, t, noise=jnp.zeros_like(x0))
        np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-10)

    def test_rescaled_mse_scales_vb(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([5, 900])
        noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        model = lambda xx, tt, **kw: jnp.concatenate([0.1 * xx, jnp.tanh(xx)], axis=1)
        base = create_diffusion("").training_losses(model, x, t, noise=noise)
        resc = create_diffusion("", rescale_learned_sigmas=True).training_losses(
            model, x, t, noise=noise
        )
        np.testing.assert_allclose(
            np.asarray(resc["vb"]), np.asarray(base["vb"]), rtol=1e-6
        )  # T/1000 == 1 at 1000 steps
        d100 = create_diffusion("100", rescale_learned_sigmas=True)
        b100 = create_diffusion("100")
        t100 = jnp.array([5, 90])
        r = d100.training_losses(model, x, t100, noise=noise)
        b = b100.training_losses(model, x, t100, noise=noise)
        np.testing.assert_allclose(
            np.asarray(r["vb"]), np.asarray(b["vb"]) * 0.1, rtol=1e-5
        )

    def test_use_kl(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8)) * 0.1
        t = jnp.array([5, 900])
        model = lambda xx, tt, **kw: jnp.concatenate([0.1 * xx, jnp.tanh(xx)], axis=1)
        d = create_diffusion("", use_kl=True)
        terms = d.training_losses(model, x, t, rng=jax.random.PRNGKey(1))
        assert terms["loss"].shape == (2,)
        assert np.isfinite(np.asarray(terms["loss"])).all()

    def test_q_mean_variance(self):
        d = create_diffusion("")
        x0 = jnp.ones((1, 1, 2, 2))
        t = jnp.array([100])
        mean, var, logvar = d.q_mean_variance(x0, t)
        np.testing.assert_allclose(
            np.asarray(mean[0, 0, 0, 0]), np.asarray(d.sqrt_alphas_cumprod[100]), rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(jnp.exp(logvar)), np.asarray(var), rtol=1e-5)


class TestSamplerChainGolden:
    """Full denoising chains vs the reference (SURVEY.md §4.4): DDPM with the
    noise-injection hook (deterministic per-step noise, identical in both
    frameworks), DDIM eta=0 with no noise at all."""

    @staticmethod
    def _model(x, t, **kw):
        return jnp.concatenate([0.1 * x, jnp.tanh(x)], axis=1)

    @staticmethod
    def _det_noise(t, shape):
        n = int(np.prod(shape))
        idx = jnp.arange(n, dtype=jnp.float32).reshape(shape)
        return jnp.cos(idx * 0.01 + t[0].astype(jnp.float32))

    def test_ddpm_chain_with_injected_noise(self, golden):
        g = golden("sampler_chains")
        d = create_diffusion("10")
        out = d.p_sample_loop(
            self._model,
            jnp.asarray(g["start"]),
            jax.random.PRNGKey(0),  # unused: noise_fn overrides
            clip_denoised=True,
            noise_fn=self._det_noise,
        )
        np.testing.assert_allclose(np.asarray(out), g["ddpm_final"], rtol=2e-4, atol=2e-4)

    def test_ddim_chain(self, golden):
        g = golden("sampler_chains")
        d = create_diffusion("ddim10")
        out = d.ddim_sample_loop(
            self._model, jnp.asarray(g["start"]), jax.random.PRNGKey(0), clip_denoised=True
        )
        np.testing.assert_allclose(np.asarray(out), g["ddim_final"], rtol=2e-4, atol=2e-4)


class TestGuidanceHooks:
    """condition_mean / condition_score (reference gd.py:348-376)."""

    @staticmethod
    def _model(x, t, **kw):
        return jnp.concatenate([0.1 * x, jnp.tanh(x)], axis=1)

    def test_condition_mean_shifts_by_variance_times_grad(self):
        d = create_diffusion("10")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([3, 7])
        out = d.p_mean_variance(self._model, x, t, clip_denoised=True)
        cond = lambda xx, tt, **kw: jnp.ones_like(xx) * 0.5
        new_mean = d.condition_mean(cond, out, x, t)
        np.testing.assert_allclose(
            np.asarray(new_mean),
            np.asarray(out["mean"] + out["variance"] * 0.5),
            rtol=1e-6,
        )

    def test_condition_score_consistency(self):
        """Zero gradient must leave mean/pred_xstart unchanged."""
        d = create_diffusion("10")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([3, 7])
        out = d.p_mean_variance(self._model, x, t, clip_denoised=False)
        cond0 = lambda xx, tt, **kw: jnp.zeros_like(xx)
        out2 = d.condition_score(cond0, out, x, t)
        np.testing.assert_allclose(
            np.asarray(out2["mean"]), np.asarray(out["mean"]), rtol=1e-4, atol=1e-5
        )


class TestTimestepSampler:
    def test_uniform(self):
        from mapdit_tpu.diffusion.timestep_sampler import UniformSampler

        s = UniformSampler(1000)
        t, w = s.sample(jax.random.PRNGKey(0), 512)
        assert t.shape == (512,) and (np.asarray(t) >= 0).all() and (np.asarray(t) < 1000).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_second_moment_warmup_and_weighting(self):
        from mapdit_tpu.diffusion.timestep_sampler import LossSecondMomentResampler

        s = LossSecondMomentResampler(4, history_per_term=2, uniform_prob=0.0)
        state = s.init_state()
        # before warmup: uniform
        np.testing.assert_allclose(np.asarray(s.weights(state)), 0.25)
        ts = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
        losses = jnp.array([1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0])
        state = s.update_with_local_losses(state, ts, losses)
        w = np.asarray(s.weights(state))
        np.testing.assert_allclose(w, np.array([1, 2, 3, 4]) / 10.0, rtol=1e-5)
        # ring buffer: new losses displace old ones once full
        state = s.update_with_local_losses(state, jnp.array([0, 0]), jnp.array([9.0, 9.0]))
        w2 = np.asarray(s.weights(state))
        assert w2[0] > w[0]


class TestFastChain:
    """p_sample_loop_fast must equal the general scan sampler exactly
    (same ops, same order, same RNG stream)."""

    @staticmethod
    def _model(x, t, **kw):
        return jnp.concatenate([0.1 * x, jnp.tanh(x)], axis=1)

    @pytest.mark.parametrize("clip", [True, False])
    def test_fast_matches_general(self, clip):
        d = create_diffusion("10")
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        rng = jax.random.PRNGKey(0)
        a = d.p_sample_loop(self._model, noise, rng, clip_denoised=clip)
        b = d.p_sample_loop_fast(self._model, noise, rng, clip_denoised=clip)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


class TestDPMSolverPP:
    """DPM-Solver++(2M) — beyond-reference fast ODE sampler.

    Analytic oracle: for x0 ~ N(0, I) the optimal eps-prediction is
    eps(x_t, t) = sigma_t * x_t, every marginal is N(0, I), and the exact
    probability-flow trajectory is CONSTANT: x(t) = x_T. Both the absolute
    error and the convergence order are therefore measurable exactly.
    """

    @staticmethod
    def _analytic_model():
        full = create_diffusion("")
        sig = jnp.sqrt(1.0 - full.alphas_cumprod)

        def model(x, t, **kw):
            s = sig[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
            eps = s * x
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

        return model

    def _errs(self, n_steps):
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        model = self._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
        d = create_diffusion(str(n_steps))
        x_dpm = dpm_solver_pp_loop(d, model, noise, clip_denoised=False)
        x_ddim = d.ddim_sample_loop(
            model, noise, jax.random.PRNGKey(1), clip_denoised=False
        )
        err = lambda x: float(jnp.abs(x - noise).max())
        return err(x_dpm), err(x_ddim)

    def test_second_order_convergence(self):
        # measured: dpm++ 0.072 / 0.0023 / 0.00005 at N=50/250/1000 (order ~2)
        #           ddim  0.143 / 0.0288 / 0.00735 (order 1)
        e50, d50 = self._errs(50)
        e250, d250 = self._errs(250)
        assert e50 < 0.1 and e250 < 0.005
        # 5x fewer steps than first order needs for the same error
        assert e250 < d250 / 5
        # order-2 signature: 5x steps shrink the error far more than 5x
        assert e50 / e250 > 12
        assert 3 < d50 / d250 < 8  # ddim stays first-order

    def test_deterministic_and_rng_ignored(self):
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        model = self._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
        d = create_diffusion("8")
        a = dpm_solver_pp_loop(d, model, noise, rng=jax.random.PRNGKey(0))
        b = dpm_solver_pp_loop(d, model, noise, rng=jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_coefficients(self):
        from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_coefficients

        d = create_diffusion("12")
        s_ratio, a_next, em1, c2 = dpm_solver_pp_coefficients(
            np.asarray(d.alphas_cumprod)
        )
        assert s_ratio.shape == (12,)
        # final virtual step: sigma -> 0, alpha -> 1, expm1(-inf) = -1
        assert s_ratio[-1] == 0.0 and a_next[-1] == 1.0 and em1[-1] == -1.0
        # first step has no history; final step is forced first-order
        assert c2[0] == 0.0 and c2[-1] == 0.0
        assert np.all(np.isfinite(s_ratio)) and np.all(np.isfinite(c2))
        assert np.all(c2[1:-1] > 0)

    def test_single_and_two_step_chains(self):
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        model = self._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8))
        for n in (1, 2):
            x = dpm_solver_pp_loop(create_diffusion(str(n)), model, noise)
            assert x.shape == noise.shape
            assert np.all(np.isfinite(np.asarray(x)))

    def test_point_mass_oracle_exact_trajectory(self):
        """Second analytic oracle: for point-mass data at x0*, the optimal
        eps is (x - alpha x0*)/sigma and the probability-flow trajectory is
        exactly affine: x(t) = alpha_t x0* + sigma_t c with
        c = (x_T - alpha_T x0*)/sigma_T. At t=0 the exact sample is
        alpha_0 x0* + sigma_0 c — an inhomogeneous field (unlike the N(0,I)
        oracle's constant trajectory), so it exercises different solver
        terms. [The DDPM-table endpoint is t=0, not sigma=0: the solver's
        virtual final step returns the last D combination, which for this
        model is x0* exactly.]"""
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        full = create_diffusion("")
        alpha = jnp.sqrt(full.alphas_cumprod)
        sigma = jnp.sqrt(1.0 - full.alphas_cumprod)
        x0_star = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8)) * 0.5

        def model(x, t, **kw):
            ti = t.astype(jnp.int32)
            a = alpha[ti].reshape(-1, 1, 1, 1)
            s = sigma[ti].reshape(-1, 1, 1, 1)
            eps = (x - a * x0_star) / s
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

        noise = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 8, 8))
        # exact x0 prediction at every point -> the final D is exactly x0*
        for n in (5, 20):
            x = dpm_solver_pp_loop(
                create_diffusion(str(n)), model, noise, clip_denoised=False
            )
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(jnp.broadcast_to(x0_star, x.shape)),
                atol=5e-4,
            )

    def test_karras_schedule_beats_uniform(self):
        """EDM sigma spacing: same solver, same step count, ~2.5-3x lower
        discretization error (measured 0.505/0.176/0.023 vs 1.29/0.45/0.072
        at N=10/20/50 against the exact solution)."""
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        model = self._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
        err = lambda x: float(jnp.abs(x - noise).max())
        for n, bound in ((20, 0.25), (50, 0.04)):
            eu = err(dpm_solver_pp_loop(
                create_diffusion(str(n)), model, noise, clip_denoised=False))
            ek = err(dpm_solver_pp_loop(
                create_diffusion(f"karras{n}"), model, noise, clip_denoised=False))
            assert ek < bound and ek < eu / 2, (n, ek, eu)

    def test_start_x_parameterization_matches(self):
        """x0-predicting process must trace the same trajectory as the
        eps-predicting one when both models encode the same posterior."""
        from mapdit_tpu.diffusion import dpm_solver_pp_loop

        full = create_diffusion("")
        acp = full.alphas_cumprod

        def x0_model(x, t, **kw):
            a = jnp.sqrt(acp[t.astype(jnp.int32)]).reshape(-1, 1, 1, 1)
            out = a * x  # E[x0 | x_t] for N(0, I) data
            return jnp.concatenate([out, jnp.zeros_like(out)], axis=1)

        noise = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 8))
        d_eps = create_diffusion("16")
        d_x0 = create_diffusion("16", predict_xstart=True)
        a = dpm_solver_pp_loop(d_eps, self._analytic_model(), noise, clip_denoised=False)
        b = dpm_solver_pp_loop(d_x0, x0_model, noise, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestDDIMEta:
    def test_eta1_equals_ddpm_fixed_small(self):
        """DDIM eta=1 is exactly the ancestral DDPM chain under the
        posterior (FIXED_SMALL) variance — same per-step RNG stream, so the
        chains coincide numerically (classic DDIM eq. 16 identity)."""
        d = create_diffusion("10", learn_sigma=False, sigma_small=True)
        model = lambda x, t, **kw: 0.1 * x + 0.01 * t.reshape(-1, 1, 1, 1)
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        rng = jax.random.PRNGKey(0)
        a = d.p_sample_loop(model, noise, rng, clip_denoised=False)
        b = d.ddim_sample_loop(model, noise, rng, clip_denoised=False, eta=1.0)
        scale = float(jnp.abs(a).max())
        assert float(jnp.abs(a - b).max()) < 1e-5 * scale
        # eta=0 is a different (deterministic) trajectory
        c = d.ddim_sample_loop(model, noise, rng, clip_denoised=False, eta=0.0)
        assert float(jnp.abs(a - c).max()) > 1e-2 * scale


class TestDDIMReverse:
    @staticmethod
    def _model(x, t, **kw):
        return jnp.concatenate([0.05 * x, jnp.tanh(x)], axis=1)

    def test_reverse_then_forward_roundtrip(self):
        """DDIM ODE: encode one step forward (reverse sample) then decode one
        step back approximately recovers x (smooth pseudo-model)."""
        d = create_diffusion("ddim25")
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([10, 10])
        fwd = d.ddim_reverse_sample(self._model, x, t, clip_denoised=False)["sample"]
        back = d.ddim_sample(
            self._model, fwd, t + 1, jax.random.PRNGKey(1), clip_denoised=False, eta=0.0
        )["sample"]
        # one-step ODE discretization error only
        assert float(jnp.abs(back - x).mean()) < 0.1

    def test_continuous_gaussian_log_likelihood(self):
        from mapdit_tpu.diffusion.dmath import continuous_gaussian_log_likelihood

        x = jnp.array([0.0, 1.0])
        ll = continuous_gaussian_log_likelihood(
            x, means=jnp.zeros(2), log_scales=jnp.zeros(2)
        )
        import math

        np.testing.assert_allclose(
            np.asarray(ll),
            [-0.5 * math.log(2 * math.pi), -0.5 - 0.5 * math.log(2 * math.pi)],
            rtol=1e-6,
        )


class TestHalfBatchCFGChain:
    """The CFG half-batch chain must equal the legacy 2N chain's first half
    exactly when step noise is per-sample-identical (injected)."""

    def test_half_chain_matches_legacy_first_half(self):
        import functools

        from mapdit_tpu.models import build_config, init_model
        from mapdit_tpu.models.dit import DiT
        from mapdit_tpu.runtime import build_shared_sample_fn

        cfg = build_config("DiT-XS/8", in_channels=4, input_size=16, num_classes=10)
        model, variables = init_model(cfg, seed=0)
        d = create_diffusion("4")
        n = 2

        z = jax.random.normal(jax.random.PRNGKey(0), (n, 4, 16, 16))
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate(
            [jnp.array([1, 2], jnp.int32), jnp.full((n,), 10, jnp.int32)]
        )

        def det_noise(t, shape):
            # identical pattern per sample (broadcast over batch)
            per = jnp.cos(
                jnp.arange(int(np.prod(shape[1:])), dtype=jnp.float32).reshape(
                    (1,) + shape[1:]
                )
                * 0.01
                + t[0]
            )
            return jnp.broadcast_to(per, shape)

        # legacy 2N chain via the general sampler + explicit CFG model_fn
        def legacy_model_fn(x, t, y):
            return model.apply(variables, x, t, y, 4.0, method=DiT.forward_with_cfg)

        legacy = d.p_sample_loop(
            legacy_model_fn, z2, jax.random.PRNGKey(1), clip_denoised=True,
            model_kwargs={"y": y2}, noise_fn=det_noise,
        )

        # half-batch chain (fast path) with the same injected noise
        prepare, _ = build_shared_sample_fn(cfg, d, cfg_scale=4.0, fold=False)
        pv = prepare(variables)

        def half_model_fn(xh, t, y):
            out = model.apply(
                pv, jnp.concatenate([xh, xh]), jnp.concatenate([t, t]), y2, 4.0,
                method=DiT.forward_with_cfg,
            )
            return out[:n]

        half = d.p_sample_loop_fast(
            half_model_fn, z, jax.random.PRNGKey(1), clip_denoised=True,
            model_kwargs={"y": y2[:n]}, noise_fn=det_noise,
        )
        np.testing.assert_allclose(
            np.asarray(legacy[:n]), np.asarray(half), rtol=1e-5, atol=1e-5
        )


class TestUniPC:
    """UniPC(bh2, order 2 + corrector) — beyond-reference predictor-corrector
    sampler (arXiv 2302.04867): effective order 3 at the same model-call
    count as DPM-Solver++(2M). Same analytic oracles as TestDPMSolverPP."""

    def test_beats_dpmpp_at_matched_calls(self):
        """Measured on the N(0,I) oracle (exact trajectory = constant):
        unipc 0.426/0.057/0.0011 vs dpm++ 0.451/0.072/0.0023 at N=20/50/250
        uniform, and 0.122/0.0063/0.00012 vs 0.176/0.023/0.00064 on karras
        grids — identical FLOPs, up to ~5x lower discretization error."""
        from mapdit_tpu.diffusion import dpm_solver_pp_loop, unipc_loop

        model = TestDPMSolverPP._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
        err = lambda x: float(jnp.abs(x - noise).max())
        for spec, bound in (("50", 0.07), ("karras20", 0.16), ("karras50", 0.01)):
            d = create_diffusion(spec)
            eu = err(unipc_loop(d, model, noise, clip_denoised=False))
            ed = err(dpm_solver_pp_loop(d, model, noise, clip_denoised=False))
            assert eu < bound and eu < ed, (spec, eu, ed)

    def test_higher_order_convergence(self):
        from mapdit_tpu.diffusion import unipc_loop

        model = TestDPMSolverPP._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
        err = lambda x: float(jnp.abs(x - noise).max())
        e50 = err(unipc_loop(create_diffusion("50"), model, noise,
                             clip_denoised=False))
        e250 = err(unipc_loop(create_diffusion("250"), model, noise,
                              clip_denoised=False))
        # 5x steps shrink the error by ~50x (measured 0.0569 -> 0.00107):
        # a strictly higher-order signature than dpm++'s ~30x on this grid
        assert e50 < 0.07 and e250 < 0.002 and e50 / e250 > 25

    def test_deterministic_and_rng_ignored(self):
        from mapdit_tpu.diffusion import unipc_loop

        model = TestDPMSolverPP._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
        d = create_diffusion("8")
        a = unipc_loop(d, model, noise, rng=jax.random.PRNGKey(0))
        b = unipc_loop(d, model, noise, rng=jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_coefficients(self):
        from mapdit_tpu.diffusion.unipc import unipc_coefficients

        d = create_diffusion("12")
        co = unipc_coefficients(np.asarray(d.alphas_cumprod))
        assert all(v.shape == (12,) for v in co.values())
        # final virtual step: sigma -> 0, alpha -> 1, expm1(-inf) = -1,
        # first-order (no history weight)
        assert co["sr_p"][-1] == 0.0 and co["a_p"][-1] == 1.0
        assert co["phi1_p"][-1] == -1.0 and co["rho_p"][-1] == 0.0
        # first step: no history for the predictor, no corrector for s_0
        assert co["rho_p"][0] == 0.0 and co["use_c"][0] == 0.0
        # interior: simplified UniP-2 weight; corrector ramps order 1 -> 2
        assert np.all(co["rho_p"][1:-1] == 0.5)
        assert co["rho_ct"][1] == 0.5 and co["rho_cp"][1] == 0.0
        assert np.all(co["use_c"][1:] == 1.0)
        assert np.all(co["rho_cp"][2:] != 0.0)
        for v in co.values():
            assert np.all(np.isfinite(v))

    def test_single_and_two_step_chains(self):
        from mapdit_tpu.diffusion import unipc_loop

        model = TestDPMSolverPP._analytic_model()
        noise = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8))
        for n in (1, 2):
            x = unipc_loop(create_diffusion(str(n)), model, noise)
            assert x.shape == noise.shape
            assert np.all(np.isfinite(np.asarray(x)))

    def test_point_mass_oracle_exact_trajectory(self):
        """With an exact x0 prediction at every point all multistep
        differences vanish and the corrector is a no-op in expectation —
        the chain must land exactly on x0* (same oracle as the dpm++
        test; exercises the corrector/predictor D1 terms cancelling)."""
        from mapdit_tpu.diffusion import unipc_loop

        full = create_diffusion("")
        alpha = jnp.sqrt(full.alphas_cumprod)
        sigma = jnp.sqrt(1.0 - full.alphas_cumprod)
        x0_star = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8)) * 0.5

        def model(x, t, **kw):
            ti = t.astype(jnp.int32)
            a = alpha[ti].reshape(-1, 1, 1, 1)
            s = sigma[ti].reshape(-1, 1, 1, 1)
            eps = (x - a * x0_star) / s
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

        noise = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 8, 8))
        for n in (5, 20):
            x = unipc_loop(
                create_diffusion(str(n)), model, noise, clip_denoised=False
            )
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(jnp.broadcast_to(x0_star, x.shape)),
                atol=5e-4,
            )

    def test_start_x_parameterization_matches(self):
        """x0-predicting process must trace the same trajectory as the
        eps-predicting one when both models encode the same posterior."""
        from mapdit_tpu.diffusion import unipc_loop

        full_eps = create_diffusion("20")
        full_x0 = create_diffusion("20", predict_xstart=True)
        sig = jnp.sqrt(1.0 - create_diffusion("").alphas_cumprod)

        def eps_model(x, t, **kw):
            s = sig[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
            eps = s * x
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

        def x0_model(x, t, **kw):
            s = sig[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
            a = jnp.sqrt(1.0 - s**2)
            x0 = a * x  # same posterior as eps = s * x
            return jnp.concatenate([x0, jnp.zeros_like(x0)], axis=1)

        noise = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 8, 8))
        a = unipc_loop(full_eps, eps_model, noise, clip_denoised=False)
        b = unipc_loop(full_x0, x0_model, noise, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
