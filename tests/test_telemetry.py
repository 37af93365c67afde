"""Magnitude-preservation telemetry (training/telemetry.py).

The --log-magnitudes CLI surface is exercised in tests/test_cli.py
(test_metrics_jsonl_and_profile_trace); these are the numeric contracts:
the forced-WN weight invariant, probe equivalence across the scan_blocks
param layouts, and coverage of the vanilla (LayerNorm) and remat paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model, project_weights
from mapdit_tpu.models.dit import stack_block_params
from mapdit_tpu.training.telemetry import make_activation_probe, weight_magnitudes

XS = dict(in_channels=4, input_size=16, num_classes=8)

VANILLA = dict(
    use_cosine_attention=False,
    use_weight_normalization=False,
    use_forced_weight_normalization=False,
    use_mp_residual=False,
    use_mp_silu=False,
    use_no_layernorm=False,
    use_mp_pos_enc=False,
    use_mp_embedding=False,
)


def _batch(n=4):
    k = jax.random.PRNGKey(3)
    return {
        "mean": jax.random.normal(k, (n, 4, 16, 16)),
        "std": 0.1 * jnp.ones((n, 4, 16, 16)),
        "y": jnp.arange(n, dtype=jnp.int32) % 8,
    }


def _probe_out(cfg, variables):
    diffusion = create_diffusion(timestep_respacing="")
    probe = make_activation_probe(
        cfg, diffusion, stats_mean=jnp.zeros(4), stats_std=jnp.ones(4)
    )
    return jax.jit(probe)(
        variables["params"],
        variables.get("constants", {}),
        _batch(),
        jax.random.PRNGKey(0),
    )


class TestWeightMagnitudes:
    def test_forced_wn_projection_invariant(self):
        """project_weights pins every WN weight row to unit RMS — the
        telemetry must read ~0 deviation right after projection."""
        cfg = build_config("DiT-XS/8", **XS)
        _, variables = init_model(cfg)
        raw = weight_magnitudes(variables["params"])
        assert float(raw["w_rms_dev_max"]) > 1e-2  # random init is off-manifold
        projected = project_weights(variables["params"], cfg)
        post = weight_magnitudes(projected)
        assert float(post["w_rms_dev_max"]) < 1e-4
        # gains exist (init 0) in the MP family
        assert float(post["gain_abs_max"]) == 0.0

    def test_scan_stacked_layout_same_summary(self):
        """The (depth,out,in) scan layout must summarize identically to the
        per-block layout of the same weights."""
        cfg = build_config("DiT-XS/8", **XS)
        _, variables = init_model(cfg)
        per_block = weight_magnitudes(variables["params"])
        stacked = weight_magnitudes(stack_block_params(variables["params"], cfg.depth))
        for k in per_block:
            np.testing.assert_allclose(
                float(per_block[k]), float(stacked[k]), rtol=1e-6
            )


class TestActivationProbe:
    def test_scan_and_per_block_layouts_agree(self):
        """Same weights through both graph layouts -> same per-block RMS."""
        cfg = build_config("DiT-XS/8", **XS)
        _, variables = init_model(cfg, seed=1)
        a = _probe_out(cfg, variables)
        stacked = {
            "params": stack_block_params(variables["params"], cfg.depth),
            "constants": variables["constants"],
        }
        b = _probe_out(cfg.replace(scan_blocks=True), stacked)
        np.testing.assert_allclose(
            np.asarray(a["block_rms"]), np.asarray(b["block_rms"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(a["out_rms"]), float(b["out_rms"]), rtol=2e-5
        )
        assert a["block_rms"].shape == (cfg.depth,)

    @pytest.mark.parametrize(
        "overrides",
        [dict(), VANILLA, dict(remat=True), dict(modulation="rotation")],
        ids=["mp", "vanilla", "remat", "rotation"],
    )
    def test_probe_covers_config_families(self, overrides):
        cfg = build_config("DiT-XS/8", **XS, **overrides)
        _, variables = init_model(cfg)
        out = _probe_out(cfg, variables)
        assert out["block_rms"].shape == (cfg.depth,)
        assert np.isfinite(np.asarray(out["block_rms"])).all()
        assert np.isfinite(float(out["out_rms"]))

    def test_presampled_x_batch(self):
        """The {"x", "y"} batch format (pre-sampled latents) is probed too."""
        cfg = build_config("DiT-XS/8", **XS)
        _, variables = init_model(cfg)
        diffusion = create_diffusion(timestep_respacing="")
        probe = make_activation_probe(cfg, diffusion)
        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(1), (4, 4, 16, 16)),
            "y": jnp.zeros((4,), jnp.int32),
        }
        out = jax.jit(probe)(
            variables["params"], variables["constants"], batch, jax.random.PRNGKey(0)
        )
        assert np.isfinite(np.asarray(out["block_rms"])).all()
