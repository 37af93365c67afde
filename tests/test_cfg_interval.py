"""Limited-interval classifier-free guidance (arXiv 2404.07724).

mapdit_tpu/runtime.py applies CFG only on chain steps whose noise level
sigma(t) lies inside a user interval; outside it the chain runs the
cond-only model on N rows instead of the 2N CFG batch. The guidance
pattern is static, so the chain compiles as up to three fixed-shape scan
segments stitched through the carried state. These tests pin the three
exactness limits (full interval == exact CFG chain; empty interval ==
cond-only chain; a trivially-sliced chain == the unsegmented chain) and
the sigma->segment mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.runtime import (
    build_model_fn,
    build_sample_fn,
    cfg_interval_segments,
)

N = 2
FULL = (0.0, 1e9)
EMPTY = (1e9, 2e9)


@pytest.fixture(scope="module")
def setup():
    cfg = build_config("DiT-XS/8", in_channels=4, input_size=16, num_classes=10)
    _, variables = init_model(cfg, seed=0)
    d = create_diffusion("8")
    z = jax.random.normal(jax.random.PRNGKey(0), (N, 4, 16, 16))
    z2 = jnp.concatenate([z, z], axis=0)
    y2 = jnp.concatenate(
        [jnp.array([3, 7], jnp.int32), jnp.full((N,), 10, jnp.int32)]
    )
    rng = jax.random.PRNGKey(1)
    return cfg, variables, d, z, z2, y2, rng


class TestSegmentMapping:
    def test_full_and_empty(self, setup):
        _, _, d, *_ = setup
        assert cfg_interval_segments(d, *FULL) == (0, d.num_timesteps)
        assert cfg_interval_segments(d, *EMPTY) == (0, 0)

    def test_middle_matches_bruteforce(self, setup):
        _, _, d, *_ = setup
        acp = np.asarray(d.alphas_cumprod, np.float64)
        sigma = np.sqrt((1.0 - acp) / acp)[::-1]  # chain order
        lo, hi = float(sigma[5]), float(sigma[2])  # guided positions 2..5
        g0, g1 = cfg_interval_segments(d, lo, hi)
        assert (g0, g1) == (2, 6)
        mask = (sigma >= lo) & (sigma <= hi)
        assert mask[g0:g1].all() and not mask[:g0].any() and not mask[g1:].any()

    @pytest.mark.parametrize("spec", ["8", "20", "10,10", "karras16"])
    def test_randomized_intervals_match_bruteforce(self, spec):
        """100 random sigma intervals (plus degenerate edges) on several
        respaced grids: the contiguous [g0, g1) must equal the brute-force
        membership mask exactly."""
        from mapdit_tpu.diffusion import create_diffusion

        try:
            d = create_diffusion(spec)
        except Exception:
            pytest.skip(f"respacing spec {spec} unsupported")
        acp = np.asarray(d.alphas_cumprod, np.float64)
        sigma = np.sqrt((1.0 - acp) / acp)[::-1]
        rng = np.random.default_rng(0)
        cases = [(0.0, 1e9), (1e9, 2e9), (0.0, 0.0)]
        for _ in range(100):
            a, b = rng.uniform(0, float(sigma.max()) * 1.2, size=2)
            cases.append((min(a, b), max(a, b)))
        for lo, hi in cases:
            g0, g1 = cfg_interval_segments(d, lo, hi)
            mask = (sigma >= lo) & (sigma <= hi)
            expect = np.zeros_like(mask)
            expect[g0:g1] = True
            np.testing.assert_array_equal(mask, expect, err_msg=f"{lo=} {hi=}")


class TestExactnessLimits:
    @pytest.mark.parametrize("sampler", ["ddpm", "dpm++", "unipc"])
    def test_full_interval_matches_exact_cfg_chain(self, setup, sampler):
        cfg, variables, d, z, z2, y2, rng = setup
        exact = build_sample_fn(
            cfg, variables, d, cfg_scale=4.0, sampler=sampler, clip_denoised=True
        )(z2, y2, rng)
        seg = build_sample_fn(
            cfg, variables, d, cfg_scale=4.0, sampler=sampler, clip_denoised=True,
            cfg_interval=FULL,
        )(z2, y2, rng)
        # same math + same RNG stream; only XLA fusion noise across the
        # (empty-edged) segment boundaries may separate the programs
        np.testing.assert_allclose(
            np.asarray(exact), np.asarray(seg), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("sampler", ["ddpm", "dpm++", "unipc"])
    def test_empty_interval_is_cond_only_chain(self, setup, sampler):
        cfg, variables, d, z, z2, y2, rng = setup
        cond_only = build_sample_fn(
            cfg, variables, d, cfg_scale=None, sampler=sampler, clip_denoised=True
        )(z, y2[:N], rng)
        seg = build_sample_fn(
            cfg, variables, d, cfg_scale=4.0, sampler=sampler, clip_denoised=True,
            cfg_interval=EMPTY,
        )(z2, y2, rng)
        assert seg.shape == z2.shape  # 2N output contract preserved
        np.testing.assert_allclose(
            np.asarray(cond_only), np.asarray(seg[:N]), rtol=1e-5, atol=1e-5
        )

    def test_middle_interval_differs_from_both_limits(self, setup):
        """A genuinely partial interval is neither the full-CFG nor the
        cond-only chain — the middle segment really guides."""
        cfg, variables, d, z, z2, y2, rng = setup
        acp = np.asarray(d.alphas_cumprod, np.float64)
        sigma = np.sqrt((1.0 - acp) / acp)[::-1]
        interval = (float(sigma[5]), float(sigma[2]))
        mk = lambda ci, cs: build_sample_fn(
            cfg, variables, d, cfg_scale=cs, sampler="dpm++",
            clip_denoised=True, cfg_interval=ci,
        )
        mid = np.asarray(mk(interval, 4.0)(z2, y2, rng)[:N])
        full = np.asarray(mk(None, 4.0)(z2, y2, rng)[:N])
        cond = np.asarray(build_sample_fn(
            cfg, variables, d, cfg_scale=None, sampler="dpm++", clip_denoised=True
        )(z, y2[:N], rng))
        assert np.isfinite(mid).all()
        assert np.abs(mid - full).max() > 1e-4
        assert np.abs(mid - cond).max() > 1e-4


class TestStepSliceStitching:
    """The segmented chain primitives reproduce the unsegmented chain
    bit-tight when stitched with the SAME model_fn — the carried state
    (RNG key / 2M history) crosses the boundary exactly."""

    def test_ddpm_fast_chain_slices_stitch(self, setup):
        cfg, variables, d, z, z2, y2, rng = setup
        model_fn = build_model_fn(cfg, variables)
        kw = dict(clip_denoised=True, model_kwargs={"y": y2[:N]})
        base = d.p_sample_loop_fast(model_fn, z, rng, **kw)
        x, key = d.p_sample_loop_fast(
            model_fn, z, rng, step_slice=(0, 3), return_carry=True, **kw
        )
        x = d.p_sample_loop_fast(
            model_fn, x, key, step_slice=(3, d.num_timesteps), **kw
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(x), rtol=1e-6, atol=1e-6
        )

    def test_dpmpp_chain_slices_stitch(self, setup):
        """The 2M history (prev_x0) and the h_{i-1}-dependent c2 weight must
        survive the boundary: coefficients come from the FULL grid."""
        from mapdit_tpu.diffusion.dpm_solver import dpm_solver_pp_loop

        cfg, variables, d, z, z2, y2, rng = setup
        model_fn = build_model_fn(cfg, variables)
        kw = dict(clip_denoised=True, model_kwargs={"y": y2[:N]})
        base = dpm_solver_pp_loop(d, model_fn, z, **kw)
        x, x0 = dpm_solver_pp_loop(
            d, model_fn, z, step_slice=(0, 3), return_carry=True, **kw
        )
        x = dpm_solver_pp_loop(
            d, model_fn, x, prev_x0=x0, step_slice=(3, d.num_timesteps), **kw
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(x), rtol=1e-6, atol=1e-6
        )

    def test_unipc_chain_slices_stitch(self, setup):
        """UniPC carries a 4-tuple (predicted sample, corrected sample, two
        x0 outputs) across the boundary; coefficients (incl. the corrector
        gating and neighbor spacings) come from the FULL grid."""
        from mapdit_tpu.diffusion.unipc import unipc_loop

        cfg, variables, d, z, z2, y2, rng = setup
        model_fn = build_model_fn(cfg, variables)
        kw = dict(clip_denoised=True, model_kwargs={"y": y2[:N]})
        base = unipc_loop(d, model_fn, z, **kw)
        carry = unipc_loop(
            d, model_fn, z, step_slice=(0, 3), return_carry=True, **kw
        )
        x = unipc_loop(
            d, model_fn, carry[0], prev_carry=carry,
            step_slice=(3, d.num_timesteps), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(x), rtol=1e-6, atol=1e-6
        )

    def test_empty_slice_passes_carry_through(self, setup):
        cfg, variables, d, z, z2, y2, rng = setup
        model_fn = build_model_fn(cfg, variables)
        x, key = d.p_sample_loop_fast(
            model_fn, z, rng, step_slice=(0, 0), return_carry=True,
            clip_denoised=True, model_kwargs={"y": y2[:N]},
        )
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))
        np.testing.assert_array_equal(np.asarray(key), np.asarray(rng))


class TestCachedChainComposition:
    """cfg_interval composed with Delta-DiT span caching: the guided range
    snaps OUTWARD to cache-group boundaries and the chain runs as three
    cached group-scans; the two exactness limits must still hold."""

    @pytest.mark.parametrize("sampler", ["ddpm", "dpm++"])
    def test_full_interval_matches_cached_cfg_chain(self, setup, sampler):
        from mapdit_tpu.runtime import build_cached_sample_fn

        cfg, variables, d, z, z2, y2, rng = setup
        kw = dict(cache_interval=2, sampler=sampler, clip_denoised=True)
        base = build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, **kw
        )(z2, y2, rng)
        seg = build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, cfg_interval=FULL, **kw
        )(z2, y2, rng)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(seg), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("sampler", ["ddpm", "dpm++"])
    def test_empty_interval_is_cond_only_cached_chain(self, setup, sampler):
        from mapdit_tpu.runtime import build_cached_sample_fn

        cfg, variables, d, z, z2, y2, rng = setup
        kw = dict(cache_interval=2, sampler=sampler, clip_denoised=True)
        cond = build_cached_sample_fn(
            cfg, variables, d, cfg_scale=None, **kw
        )(z, y2[:N], rng)
        seg = build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, cfg_interval=EMPTY, **kw
        )(z2, y2, rng)
        np.testing.assert_allclose(
            np.asarray(cond), np.asarray(seg[:N]), rtol=1e-5, atol=1e-5
        )

    def test_partial_interval_runs_and_differs(self, setup):
        from mapdit_tpu.runtime import build_cached_sample_fn

        cfg, variables, d, z, z2, y2, rng = setup
        acp = np.asarray(d.alphas_cumprod, np.float64)
        sigma = np.sqrt((1.0 - acp) / acp)[::-1]
        interval = (float(sigma[5]), float(sigma[2]))  # groups 1..3 guided
        kw = dict(cache_interval=2, sampler="dpm++", clip_denoised=True)
        mid = np.asarray(build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, cfg_interval=interval, **kw
        )(z2, y2, rng)[:N])
        full = np.asarray(build_cached_sample_fn(
            cfg, variables, d, cfg_scale=4.0, **kw
        )(z2, y2, rng)[:N])
        assert np.isfinite(mid).all()
        assert np.abs(mid - full).max() > 1e-4


class TestMegakernelComposition:
    def test_segmented_chain_through_mega_kernel_interpret(self):
        """The chip path the queued bench rows will run: the whole-block
        Pallas megakernel (interpret mode on CPU) inside the segmented
        cfg-interval chain must match the unfused XLA chain. The segments
        change batch rows N/2N/N, so the kernel's group packing sees both
        shapes in one program."""
        from mapdit_tpu.models import build_config, init_model

        base = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
            block_kernel="off",
        )
        _, variables = init_model(base, seed=3)
        d = create_diffusion("4")
        z = jax.random.normal(jax.random.PRNGKey(0), (N, 4, 16, 16))
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate(
            [jnp.array([3, 7], jnp.int32), jnp.full((N,), 10, jnp.int32)]
        )
        rng = jax.random.PRNGKey(1)
        acp = np.asarray(d.alphas_cumprod, np.float64)
        sigma = np.sqrt((1.0 - acp) / acp)[::-1]
        interval = (float(sigma[2]), float(sigma[1]))  # positions 1..2 guided
        outs = {}
        for bk in ("off", "mega"):
            cfg = base.replace(block_kernel=bk)
            outs[bk] = np.asarray(build_sample_fn(
                cfg, variables, d, cfg_scale=4.0, sampler="dpm++",
                clip_denoised=True, cfg_interval=interval,
            )(z2, y2, rng))
        assert np.isfinite(outs["mega"]).all()
        np.testing.assert_allclose(outs["off"], outs["mega"], rtol=2e-3, atol=2e-3)


class TestBuilderValidation:
    def test_requires_cfg_scale(self, setup):
        cfg, variables, d, *_ = setup
        with pytest.raises(AssertionError, match="needs CFG"):
            build_sample_fn(
                cfg, variables, d, cfg_scale=None, cfg_interval=FULL
            )

    def test_requires_supported_sampler(self, setup):
        cfg, variables, d, *_ = setup
        with pytest.raises(AssertionError, match="ddpm, dpm"):
            build_sample_fn(
                cfg, variables, d, cfg_scale=4.0, sampler="ddim",
                cfg_interval=FULL,
            )
