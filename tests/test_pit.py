"""Parallel-in-time (block-Picard) DDIM sampling — runtime.build_pit_sample_fn.

The multi-chip single-sample-latency axis (ParaDiGMS-family, arXiv
2305.16317, restructured as a static block/sweep schedule for XLA; see
docs/BENCH_NOTES r03s9). Correctness contract: sweeps == window reproduces
the sequential chain, fewer sweeps converge monotonically toward it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.parallel import make_mesh, replicated
from mapdit_tpu.runtime import build_pit_sample_fn, build_sample_fn


@pytest.fixture(scope="module")
def setup():
    cfg = build_config("DiT-XS/8", in_channels=4, input_size=16, num_classes=10)
    _, variables = init_model(cfg, seed=0)
    return cfg, variables


def _ref(cfg, variables, d, z, y, key, cfg_scale=None):
    fn = build_sample_fn(
        cfg, variables, d, cfg_scale=cfg_scale, sampler="ddim",
        clip_denoised=True,
    )
    return np.asarray(fn(z, y, key))


class TestBlockPicard:
    def test_full_sweeps_exact(self, setup):
        """sweeps == window: Picard on a K-step lower-triangular dependency
        converges in exactly K Jacobi sweeps — the pit chain must equal the
        sequential ddim chain (float-fusion noise only)."""
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        y = jnp.arange(2, dtype=jnp.int32)
        key = jax.random.PRNGKey(1)
        ref = _ref(cfg, variables, d, z, y, key)
        pit = build_pit_sample_fn(
            cfg, variables, d, window=8, sweeps=8, clip_denoised=True
        )
        np.testing.assert_allclose(ref, np.asarray(pit(z, y, key)),
                                   rtol=1e-4, atol=1e-4)

    def test_deviation_monotone_in_sweeps(self, setup):
        """Each extra sweep adds one order of Picard accuracy: rel-L2 vs
        the sequential chain must strictly shrink as sweeps grow."""
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16, 16))
        y = jnp.arange(2, dtype=jnp.int32)
        key = jax.random.PRNGKey(3)
        ref = _ref(cfg, variables, d, z, y, key)
        devs = []
        for sweeps in (1, 2, 4, 8):
            fn = build_pit_sample_fn(
                cfg, variables, d, window=8, sweeps=sweeps, clip_denoised=True
            )
            out = np.asarray(fn(z, y, key))
            assert np.isfinite(out).all(), sweeps
            devs.append(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        assert devs[0] > devs[1] > devs[2] > devs[3], devs

    def test_cfg_full_sweeps_exact(self, setup):
        """CFG batch contract ([z; z], [y; null] in, 2N out) + exactness."""
        cfg, variables = setup
        d = create_diffusion("4")
        n = 2
        z = jax.random.normal(jax.random.PRNGKey(4), (n, 4, 16, 16))
        y = jnp.arange(n, dtype=jnp.int32)
        z2 = jnp.concatenate([z, z], axis=0)
        y2 = jnp.concatenate([y, jnp.full((n,), cfg.num_classes, jnp.int32)])
        key = jax.random.PRNGKey(5)
        ref = _ref(cfg, variables, d, z2, y2, key, cfg_scale=1.5)
        pit = build_pit_sample_fn(
            cfg, variables, d, cfg_scale=1.5, window=4, sweeps=4,
            clip_denoised=True,
        )
        out = np.asarray(pit(z2, y2, key))
        assert out.shape == ref.shape  # 2N contract preserved
        np.testing.assert_allclose(ref[:n], out[:n], rtol=1e-4, atol=1e-4)

    def test_sharded_window_matches_unsharded(self, setup):
        """The latency layout: a single sample (B=1), window 8 over the
        8-device 'data' axis — each device owns one window position; the
        result must match the unsharded pit chain AND (at full sweeps) the
        sequential chain."""
        assert len(jax.devices()) == 8
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 16))
        y = jnp.zeros((1,), jnp.int32)
        key = jax.random.PRNGKey(7)
        ref = _ref(cfg, variables, d, z, y, key)
        mesh = make_mesh(n_data=8, n_model=1)
        fn = build_pit_sample_fn(
            cfg, variables, d, window=8, sweeps=8, clip_denoised=True,
            mesh=mesh,
        )
        with jax.set_mesh(mesh):
            out = np.asarray(fn(jax.device_put(z, replicated(mesh)),
                                jax.device_put(y, replicated(mesh)), key))
        np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-4)

    def test_composes_with_tensor_parallel(self, setup):
        """pit rows over 'data' x TP over 'model' in one mesh (dp4 x tp2):
        the two parallel axes must compose without touching the math."""
        cfg, variables = setup
        d = create_diffusion("4")
        z = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 16, 16))
        y = jnp.arange(2, dtype=jnp.int32)
        key = jax.random.PRNGKey(9)
        ref = _ref(cfg, variables, d, z, y, key)
        mesh = make_mesh(n_data=4, n_model=2)
        fn = build_pit_sample_fn(
            cfg, variables, d, window=4, sweeps=4, clip_denoised=True,
            mesh=mesh,
        )
        with jax.set_mesh(mesh):
            out = np.asarray(fn(jax.device_put(z, replicated(mesh)),
                                jax.device_put(y, replicated(mesh)), key))
        np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-4)

    def test_slide_shift1_exact(self, setup):
        """Sliding schedule, shift=1: every accepted position is one sweep
        downstream of an exact entry — must equal the sequential chain."""
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 16, 16))
        y = jnp.arange(2, dtype=jnp.int32)
        key = jax.random.PRNGKey(11)
        ref = _ref(cfg, variables, d, z, y, key)
        fn = build_pit_sample_fn(
            cfg, variables, d, window=4, shift=1, clip_denoised=True
        )
        np.testing.assert_allclose(ref, np.asarray(fn(z, y, key)),
                                   rtol=1e-4, atol=1e-4)

    def test_slide_monotone_in_shift(self, setup):
        """Smaller shift = more refinement per accepted position: rel-L2 vs
        the sequential chain must shrink as shift drops (8 -> 4 -> 2 -> 1)."""
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 16, 16))
        y = jnp.arange(2, dtype=jnp.int32)
        key = jax.random.PRNGKey(13)
        ref = _ref(cfg, variables, d, z, y, key)
        devs = []
        for shift in (8, 4, 2, 1):
            fn = build_pit_sample_fn(
                cfg, variables, d, window=8, shift=shift, clip_denoised=True
            )
            out = np.asarray(fn(z, y, key))
            assert np.isfinite(out).all(), shift
            devs.append(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        assert devs[0] > devs[1] > devs[2] > devs[3], devs

    def test_slide_sharded_matches_unsharded(self, setup):
        """Sliding schedule under the 8-device data axis == unsharded."""
        cfg, variables = setup
        d = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(14), (1, 4, 16, 16))
        y = jnp.zeros((1,), jnp.int32)
        key = jax.random.PRNGKey(15)
        plain = build_pit_sample_fn(
            cfg, variables, d, window=8, shift=2, clip_denoised=True
        )
        ref = np.asarray(plain(z, y, key))
        mesh = make_mesh(n_data=8, n_model=1)
        fn = build_pit_sample_fn(
            cfg, variables, d, window=8, shift=2, clip_denoised=True,
            mesh=mesh,
        )
        with jax.set_mesh(mesh):
            out = np.asarray(fn(jax.device_put(z, replicated(mesh)),
                                jax.device_put(y, replicated(mesh)), key))
        np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-4)

    def test_window_must_divide_chain(self, setup):
        cfg, variables = setup
        with pytest.raises(AssertionError, match="divide"):
            build_pit_sample_fn(
                cfg, variables, create_diffusion("10"), window=4, sweeps=2
            )

    def test_flops_accounting(self, setup):
        """Honesty check pinned as a test: a pit chain costs exactly
        sweeps x the sequential chain's model FLOPs (window positions per
        sweep, T/window blocks)."""
        T, window, sweeps = 8, 4, 2
        seq_calls = T
        pit_position_evals = (T // window) * sweeps * window
        assert pit_position_evals == sweeps * seq_calls
