"""Dynamic thresholding (Imagen, arXiv 2205.11487) — unit + chain tests.

The latent-space adaptation clips each sample's x0 estimate to its own
percentile of |x0| (floored), WITHOUT the paper's /s rescale. Exactness
limit: percentile=1.0 clips at max|x0| — a bit-exact no-op — so the knob
has a testable "off" position through every builder.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.diffusion.gaussian import dynamic_threshold_fn

from test_oracle_chain import C, K, S, oracle_model_fn


class TestThresholdFn:
    def test_quantile_clip_per_sample(self):
        x0 = jnp.zeros((2, 1, 4, 4))
        # sample 0: values up to 8, sample 1: all small
        x0 = x0.at[0, 0, 0, 0].set(8.0).at[0, 0, 0, 1].set(-6.0)
        x0 = x0.at[0].add(2.0 * jnp.sign(x0[0] + 0.1))  # spread sample 0
        x0 = x0.at[1].set(0.3)
        out = dynamic_threshold_fn(percentile=0.9, floor=1.0)(x0)
        s0 = float(jnp.quantile(jnp.abs(x0[0]).ravel(), 0.9))
        assert float(jnp.abs(out[0]).max()) <= s0 + 1e-6
        # sample 1 is entirely under the floor: untouched
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x0[1]))

    def test_floor_prevents_collapse(self):
        # near-zero x0 must not be clipped to its own tiny quantile
        x0 = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (3, 2, 4, 4))
        out = dynamic_threshold_fn(percentile=0.5, floor=1.0)(x0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x0))

    def test_percentile_one_is_identity(self):
        x0 = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 4))
        out = dynamic_threshold_fn(percentile=1.0, floor=1.0)(x0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x0))


class TestThresholdedChains:
    def _zy(self, m=8):
        z = jax.random.normal(jax.random.PRNGKey(11), (K * m, C, S, S))
        y = jnp.repeat(jnp.arange(K, dtype=jnp.int32), m)
        return z, y, jax.random.PRNGKey(12)

    def test_spike_suppression(self):
        """A model whose eps output carries a huge single-pixel spike over
        the mid-chain timestep band: the raw chain is corrupted by it (the
        per-step x0 estimate inherits -srm1*spike and feeds back); the
        thresholded chain clips the x0 outlier each step and lands near the
        clean-oracle output. (Measured: raw max|x| 11.6 / rel-L2 0.91 vs
        clean; thresholded max 2.0 / rel-L2 0.02.)"""
        z, y, skey = self._zy()
        mask = jnp.zeros((1, C, S, S)).at[0, 0, 0, 0].set(1.0)

        def spiky_fn(x, t, y=None):
            out = oracle_model_fn(x, t, y)
            eps, var = jnp.split(out, 2, axis=1)
            hit = ((t >= 300) & (t <= 700))[:, None, None, None].astype(eps.dtype)
            return jnp.concatenate([eps - 40.0 * hit * mask, var], axis=1)

        diff = create_diffusion("50")
        clean = diff.p_sample_loop(
            oracle_model_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        raw = diff.p_sample_loop(
            spiky_fn, z, skey, clip_denoised=False, model_kwargs={"y": y}
        )
        thr = diff.p_sample_loop(
            spiky_fn, z, skey, clip_denoised=False, model_kwargs={"y": y},
            denoised_fn=dynamic_threshold_fn(0.98, floor=2.0),
        )

        def rel(a):
            return float(jnp.linalg.norm(a - clean) / jnp.linalg.norm(clean))

        assert float(jnp.abs(raw).max()) > 8.0 and rel(raw) > 0.5
        assert float(jnp.abs(thr).max()) <= 2.05 and rel(thr) < 0.05

    def test_builder_percentile_one_bit_exact(self, golden):
        """dynamic_threshold=1.0 through build_sample_fn is a bit-exact
        no-op vs the unthresholded chain (the knob's exactness limit),
        on the real golden DiT-XS/2 weights."""
        from mapdit_tpu.models import build_config
        from mapdit_tpu.runtime import build_sample_fn
        from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

        g = golden("dit_xs2")
        sd = {k[len("sd.") :]: v for k, v in g.items() if k.startswith("sd.")}
        variables = variables_from_torch_state_dict(sd)
        cfg = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10)
        diff = create_diffusion("8")
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        y = jnp.array([3, 7], jnp.int32)
        rng = jax.random.PRNGKey(5)
        base = build_sample_fn(cfg, variables, diff, sampler="ddpm")(z, y, rng)
        thr = build_sample_fn(
            cfg, variables, diff, sampler="ddpm", dynamic_threshold=1.0
        )(z, y, rng)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(thr))
