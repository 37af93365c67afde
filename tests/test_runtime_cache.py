"""Delta-DiT block-span caching (mapdit_tpu/runtime.py:build_cached_sample_fn).

Exactness limits are bit-for-bit (empty span / interval 1 == the fast DDPM
chain on the same RNG stream); the lossy configuration's deviation is
measured against the exact chain on REAL DiT-XS/2 weights (the golden
torch-initialized state), the honest proxy while FID stays weights-gated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config
from mapdit_tpu.runtime import build_cached_sample_fn, build_sample_fn
from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

XS2 = dict(in_channels=4, input_size=16, num_classes=10)


@pytest.fixture(scope="module")
def setup(golden):
    g = golden("dit_xs2")
    sd = {k[len("sd.") :]: v for k, v in g.items() if k.startswith("sd.")}
    variables = variables_from_torch_state_dict(sd)
    cfg = build_config("DiT-XS/2", **XS2)
    d = create_diffusion("8")
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
    y = jnp.array([3, 7], jnp.int32)
    rng = jax.random.PRNGKey(1)
    return cfg, variables, d, z, y, rng


def _exact_chain(cfg, variables, d, z, y, rng, cfg_scale=None):
    """Clipped exact fast chain (clip keeps the torch-INITIALIZED golden
    weights finite over multi-step chains, like the e2e golden test)."""
    from mapdit_tpu.runtime import build_model_fn

    model_fn = build_model_fn(cfg, variables, cfg_scale=cfg_scale)
    if cfg_scale is None:
        return d.p_sample_loop_fast(
            model_fn, z, rng, clip_denoised=True, model_kwargs={"y": y}
        )
    return d.p_sample_loop_fast(
        model_fn, z, rng, clip_denoised=True, model_kwargs={"y": y}
    )


class TestBlockSpanCache:
    def test_empty_span_is_exact(self, setup):
        cfg, variables, d, z, y, rng = setup
        base = _exact_chain(cfg, variables, d, z, y, rng)
        cached = build_cached_sample_fn(
            cfg, variables, d, span=(0, 0), cache_interval=2, clip_denoised=True
        )(z, y, rng)
        # same math, different compiled program: only XLA fusion noise
        # (measured 2e-6 max) may separate them
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(cached), atol=1e-5, rtol=1e-5
        )

    def test_interval_one_is_exact(self, setup):
        cfg, variables, d, z, y, rng = setup
        base = _exact_chain(cfg, variables, d, z, y, rng)
        cached = build_cached_sample_fn(
            cfg, variables, d, span=(1, 5), cache_interval=1, clip_denoised=True
        )(z, y, rng)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(cached), atol=1e-5, rtol=1e-5
        )

    def test_deviation_measured_and_bounded(self, setup):
        """The lossy config (middle-half span, interval 2): deviation vs the
        exact chain must be finite, nonzero, and small relative to the
        signal — the honest fidelity proxy recorded in BENCH_NOTES."""
        cfg, variables, d, z, y, rng = setup
        base = np.asarray(_exact_chain(cfg, variables, d, z, y, rng))
        cached = np.asarray(
            build_cached_sample_fn(
                cfg, variables, d, cache_interval=2, clip_denoised=True
            )(z, y, rng)
        )
        assert np.isfinite(cached).all()
        rel = np.linalg.norm(cached - base) / np.linalg.norm(base)
        assert 0 < rel < 0.5, rel
        print(f"\nblock-span cache rel-L2 deviation (8 steps, interval 2): {rel:.4f}")

    def test_cfg_chain_shape_and_halves(self, setup):
        cfg, variables, d, z, y, rng = setup
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate([y, jnp.full((2,), cfg.num_classes, jnp.int32)])
        out = build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, cache_interval=2, clip_denoised=True
        )(z2, y2, rng)
        out = np.asarray(out)
        assert out.shape == (4, 4, 16, 16)
        np.testing.assert_array_equal(out[:2], out[2:])  # 2N output contract
        assert np.isfinite(out).all()

    def test_interval_must_divide(self, setup):
        cfg, variables, d, z, y, rng = setup
        with pytest.raises(AssertionError):
            build_cached_sample_fn(cfg, variables, d, cache_interval=3)


class TestDpmppComposition:
    """The span-delta protocol wraps the model call, not the chain math —
    it composes with the DPM-Solver++(2M) chain (and, through the respaced
    diffusion, with karras schedules): VERDICT r02 item #4."""

    def _exact_dpmpp(self, cfg, variables, d, z, y):
        from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_loop
        from mapdit_tpu.runtime import build_model_fn

        model_fn = build_model_fn(cfg, variables)
        return dpm_solver_pp_loop(
            d, model_fn, z, clip_denoised=True, model_kwargs={"y": y}
        )

    def test_interval_one_is_exact(self, setup):
        cfg, variables, d, z, y, rng = setup
        base = self._exact_dpmpp(cfg, variables, d, z, y)
        cached = build_cached_sample_fn(
            cfg, variables, d, span=(1, 5), cache_interval=1,
            clip_denoised=True, sampler="dpm++",
        )(z, y, rng)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(cached), atol=1e-5, rtol=1e-5
        )

    def test_empty_span_is_exact(self, setup):
        cfg, variables, d, z, y, rng = setup
        base = self._exact_dpmpp(cfg, variables, d, z, y)
        cached = build_cached_sample_fn(
            cfg, variables, d, span=(0, 0), cache_interval=2,
            clip_denoised=True, sampler="dpm++",
        )(z, y, rng)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(cached), atol=1e-5, rtol=1e-5
        )

    def test_karras_deviation_measured_and_bounded(self, setup):
        """The declared serving stack: dpm++ + karras schedule + span cache.
        Deviation vs the exact dpm+++karras chain, measured on the golden
        torch-initialized weights."""
        from mapdit_tpu.diffusion import create_diffusion, respacing_string

        cfg, variables, _, z, y, rng = setup
        dk = create_diffusion(respacing_string(8, "dpm++", "karras"))
        base = np.asarray(self._exact_dpmpp(cfg, variables, dk, z, y))
        cached = np.asarray(
            build_cached_sample_fn(
                cfg, variables, dk, cache_interval=2, clip_denoised=True,
                sampler="dpm++",
            )(z, y, rng)
        )
        assert np.isfinite(cached).all()
        rel = np.linalg.norm(cached - base) / np.linalg.norm(base)
        assert 0 < rel < 0.5, rel
        print(
            f"\ndpm+++karras span-cache rel-L2 deviation "
            f"(8 steps, interval 2): {rel:.4f}"
        )

    def test_cfg_chain_shape_and_halves(self, setup):
        cfg, variables, d, z, y, rng = setup
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate([y, jnp.full((2,), cfg.num_classes, jnp.int32)])
        out = np.asarray(
            build_cached_sample_fn(
                cfg, variables, d, cfg_scale=4.0, cache_interval=2,
                clip_denoised=True, sampler="dpm++",
            )(z2, y2, rng)
        )
        assert out.shape == (4, 4, 16, 16)
        np.testing.assert_array_equal(out[:2], out[2:])
        assert np.isfinite(out).all()

    def test_unknown_sampler_rejected(self, setup):
        cfg, variables, d, *_ = setup
        with pytest.raises(AssertionError):
            build_cached_sample_fn(cfg, variables, d, sampler="ddim")


class TestForecastMode:
    """cache_mode="forecast": skip steps linearly extrapolate the span
    delta from the two most recent full evaluations (the static,
    jit-friendly form of Predict-to-Skip, arXiv 2602.18093) instead of
    holding it. Opt-in: on the untrained golden weights the measured
    deviation is mostly >= hold's (feature trajectories aren't smooth at
    random init; BENCH_NOTES records the table) — the paper's claim awaits
    trained weights."""

    def test_interval_one_is_exact(self, setup):
        cfg, variables, d, z, y, rng = setup
        base = _exact_chain(cfg, variables, d, z, y, rng)
        out = build_cached_sample_fn(
            cfg, variables, d, span=(1, 5), cache_interval=1,
            clip_denoised=True, cache_mode="forecast",
        )(z, y, rng)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(out), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("sampler", ["ddpm", "dpm++"])
    def test_differs_from_hold_and_bounded(self, setup, sampler):
        cfg, variables, d, z, y, rng = setup
        kw = dict(cache_interval=2, clip_denoised=True, sampler=sampler)
        hold = np.asarray(build_cached_sample_fn(
            cfg, variables, d, cache_mode="hold", **kw
        )(z, y, rng))
        fc = np.asarray(build_cached_sample_fn(
            cfg, variables, d, cache_mode="forecast", **kw
        )(z, y, rng))
        assert np.isfinite(fc).all()
        assert np.abs(fc - hold).max() > 1e-5  # the forecast really applies
        if sampler == "ddpm":
            base = np.asarray(_exact_chain(cfg, variables, d, z, y, rng))
        else:
            base = np.asarray(build_cached_sample_fn(
                cfg, variables, d, span=(0, 0), cache_interval=1,
                clip_denoised=True, sampler="dpm++",
            )(z, y, rng))
        rel = np.linalg.norm(fc - base) / np.linalg.norm(base)
        assert 0 < rel < 1.0, rel

    def test_first_group_holds(self, setup):
        """No history at group 0: a chain that is ONE group long is
        identical in both modes (the zeros init never contributes)."""
        from mapdit_tpu.diffusion import create_diffusion

        cfg, variables, _, z, y, rng = setup
        d2 = create_diffusion("2")  # 2 steps = exactly one interval-2 group
        outs = [
            np.asarray(build_cached_sample_fn(
                cfg, variables, d2, cache_interval=2, clip_denoised=True,
                cache_mode=m,
            )(z, y, rng))
            for m in ("hold", "forecast")
        ]
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_composes_with_cfg_interval(self, setup):
        cfg, variables, d, z, y, rng = setup
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate([y, jnp.full((2,), cfg.num_classes, jnp.int32)])
        out = np.asarray(build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, cache_interval=2,
            clip_denoised=True, sampler="dpm++", cache_mode="forecast",
            cfg_interval=(0.3, 3.0),
        )(z2, y2, rng))
        assert out.shape == (4, 4, 16, 16)
        assert np.isfinite(out).all()

    def test_unknown_mode_rejected(self, setup):
        cfg, variables, d, *_ = setup
        with pytest.raises(AssertionError):
            build_cached_sample_fn(cfg, variables, d, cache_mode="extrapolate")
