"""The --use-* ablation grid is the paper's experiment surface (reference
README.md:57-66 names the eight flags; the snapshot hardwires them on,
SURVEY.md fact #1). Corner configs (all-on, all-off, rotation variants) are
golden/smoke-tested elsewhere; this file covers the middle of the grid:

  * every flag individually OFF trains stably — finite decreasing loss,
    finite grads — through the real jitted train step;
  * every modulation x mp-style corner does too;
  * project_weights touches exactly the flag-scoped leaves;
  * the mp_style <-> use_no_layernorm keying (models/config.py) is pinned
    by an explicit test so the cross-flag coupling cannot drift silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config, init_model
from mapdit_tpu.models.dit import project_weights
from mapdit_tpu.training import (
    create_optimizer,
    create_train_state,
    make_train_step,
    warmup_flat_invsqrt,
)
from mapdit_tpu.training.data import SyntheticLatentDataset

FLAG_NAMES = (
    "use_cosine_attention",
    "use_weight_normalization",
    "use_forced_weight_normalization",
    "use_mp_residual",
    "use_mp_silu",
    "use_no_layernorm",
    "use_mp_pos_enc",
    "use_mp_embedding",
)


def _tiny_cfg(**overrides):
    # smallest architecture that still exercises every code path: 2 blocks,
    # 64-wide (rotation modulation needs even width), 2 heads
    cfg = build_config("DiT-XS/8", in_channels=4, input_size=16, num_classes=10)
    return cfg.replace(depth=2, hidden_size=64, num_heads=2, **overrides)


def _train_steps(cfg, n_steps=8, batch_size=16):
    diffusion = create_diffusion("")
    ds = SyntheticLatentDataset(num_examples=64, num_classes=10)
    tx = create_optimizer(warmup_flat_invsqrt(1e-2, 3, 50))
    step_fn = jax.jit(
        make_train_step(
            cfg,
            diffusion,
            tx,
            stats_mean=jnp.asarray(ds.stats["mean"]),
            stats_std=jnp.asarray(ds.stats["std"]),
        ),
        donate_argnums=0,
    )
    state = create_train_state(cfg, tx, seed=0)
    it = ds.batches(batch_size=batch_size, seed=0)
    losses, grad_norms = [], []
    for _ in range(n_steps):
        state, metrics = step_fn(state, next(it))
        losses.append(float(metrics["loss"]))
        grad_norms.append(float(metrics["grad_norm"]))
    return np.asarray(losses), np.asarray(grad_norms), state


def _assert_stable(losses, grad_norms, label):
    assert np.isfinite(losses).all(), (label, losses)
    assert np.isfinite(grad_norms).all(), (label, grad_norms)
    assert (grad_norms > 0).all(), (label, grad_norms)
    # decreasing: the tail must improve on the start (8 steps at lr 1e-2
    # drops the ~1.4 init loss by a wide margin on every config)
    assert np.mean(losses[-3:]) < losses[0], (label, losses)


class TestSingleFlagOff:
    @pytest.mark.parametrize("flag", FLAG_NAMES)
    def test_trains_stably(self, flag):
        cfg = _tiny_cfg(**{flag: False})
        losses, grad_norms, _ = _train_steps(cfg)
        _assert_stable(losses, grad_norms, flag)


class TestModulationMpStyleCorners:
    @pytest.mark.parametrize("modulation", ["adaln", "rotation", "rotation_scale"])
    @pytest.mark.parametrize("no_layernorm", [True, False])
    def test_trains_stably(self, modulation, no_layernorm):
        cfg = _tiny_cfg(modulation=modulation, use_no_layernorm=no_layernorm)
        losses, grad_norms, _ = _train_steps(cfg)
        _assert_stable(losses, grad_norms, (modulation, no_layernorm))


class TestMpStyleKeying:
    def test_mp_style_is_keyed_on_use_no_layernorm(self):
        """mp_style flips ALL conditioning arithmetic (mp_sum-modulate vs
        classic x*(1+scale)+shift) and is derived solely from
        use_no_layernorm — a deliberate pairing (the classic arithmetic
        assumes pre-modulation LayerNorm; the MP arithmetic assumes
        unit-magnitude activations). Pin it so it cannot drift silently.
        Documented in train.py's --use-no-layernorm help."""
        for others in (True, False):
            base = {f: others for f in FLAG_NAMES}
            assert _tiny_cfg(**{**base, "use_no_layernorm": True}).mp_style is True
            assert _tiny_cfg(**{**base, "use_no_layernorm": False}).mp_style is False

    def test_train_cli_help_documents_the_coupling(self):
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "train.py", "--help"],
            capture_output=True, text=True, timeout=120,
        ).stdout
        assert "--use-no-layernorm" in out
        assert "conditioning arithmetic" in out


class TestProjectWeightsScope:
    def _changed_paths(self, cfg):
        _, variables = init_model(cfg, seed=0)
        params = variables["params"]
        projected = project_weights(params, cfg)
        changed = set()
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(projected),
        ):
            if not np.allclose(np.asarray(a), np.asarray(b)):
                changed.add(jax.tree_util.keystr(pa))
        return params, changed

    def _expected_paths(self, cfg, params):
        expected = set()
        for pa, leaf in jax.tree_util.tree_leaves_with_path(params):
            names = [p.key for p in pa if hasattr(p, "key")]
            if not names or names[-1] != "weight" or leaf.ndim not in (2, 3):
                continue
            is_emb = len(names) >= 2 and names[-2] == "embedding"
            flag = cfg.use_mp_embedding if is_emb else cfg.use_weight_normalization
            if flag and cfg.use_forced_weight_normalization:
                expected.add(jax.tree_util.keystr(pa))
        return expected

    @pytest.mark.parametrize(
        "overrides",
        [
            {},
            {"use_forced_weight_normalization": False},
            {"use_weight_normalization": False},
            {"use_mp_embedding": False},
            {"use_weight_normalization": False, "use_mp_embedding": False},
            {"modulation": "rotation_scale"},
        ],
        ids=lambda o: ",".join(f"{k}={v}" for k, v in o.items()) or "all-on",
    )
    def test_projection_touches_exactly_flag_scoped_leaves(self, overrides):
        """N(0,1)-initialized rows are off the norm-sqrt(in_dim) manifold
        with probability 1, so 'leaf changed by projection' is a reliable
        proxy for 'leaf is in projection scope'."""
        cfg = _tiny_cfg(**overrides)
        params, changed = self._changed_paths(cfg)
        expected = self._expected_paths(cfg, params)
        assert changed == expected, (
            changed - expected, expected - changed,
        )
        if cfg.use_forced_weight_normalization and cfg.use_weight_normalization:
            assert changed, "all-on config must project something"
        if not cfg.use_forced_weight_normalization:
            assert not changed
