"""Utility-layer tests: image grids, config round-trip, class names."""

import numpy as np
import pytest

from mapdit_tpu.utils.image import save_image_grid, to_uint8


class TestImageGrid:
    def test_to_uint8_range_and_layout(self):
        x = np.zeros((2, 3, 4, 4), np.float32)
        x[0] = -1.0
        x[1] = 1.0
        u = to_uint8(x)
        assert u.shape == (2, 4, 4, 3) and u.dtype == np.uint8
        assert u[0].max() == 0 and u[1].min() == 255

    def test_nan_handling(self):
        x = np.full((1, 3, 2, 2), np.nan, np.float32)
        u = to_uint8(x)
        assert np.isfinite(u).all()

    def test_grid_geometry(self, tmp_path):
        from PIL import Image

        x = np.random.default_rng(0).normal(size=(5, 3, 8, 8)).astype(np.float32)
        path = str(tmp_path / "g.png")
        save_image_grid(x, path, nrow=2)
        img = Image.open(path)
        # 2 cols x 3 rows of 8x8 with 2px padding
        assert img.size == (2 * 8 + 3 * 2, 3 * 8 + 4 * 2)


class TestConfigRoundTrip:
    def test_yaml_to_config(self, tmp_path):
        from mapdit_tpu.utils.experiment import (
            config_from_args,
            load_config,
            save_config,
        )

        args = {
            "model": "DiT-S/4",
            "num_classes": 17,
            "in_channels": 4,
            "input_size": 16,
            "modulation": "rotation",
            "use_mp_silu": False,
            "compute_dtype": "bfloat16",
            "attn_bwd": "residual",
            "unrelated_training_field": 123,
        }
        save_config(str(tmp_path), args)
        cfg = config_from_args(load_config(str(tmp_path)))
        assert cfg.depth == 12 and cfg.patch_size == 4
        assert cfg.num_classes == 17 and cfg.modulation == "rotation"
        assert cfg.use_mp_silu is False and cfg.compute_dtype == "bfloat16"
        assert cfg.attn_bwd == "residual"


class TestClassNames:
    def test_vendored_table_offline_parity(self):
        """The 1000-entry ImageNet name table ships as package data, so
        offline prints match the reference's (`utils.py:37-1037`)."""
        from mapdit_tpu.utils.class_names import _mapping, class_name

        m = _mapping()
        assert m is not None and len(m) == 1000
        assert class_name(0) == "tench, Tinca tinca"
        assert class_name(3) == "tiger shark, Galeocerdo cuvieri"
        assert class_name(999) == "toilet tissue, toilet paper, bathroom tissue"

    def test_out_of_range_fallback(self):
        from mapdit_tpu.utils.class_names import class_name

        assert class_name(1234) == "class 1234"


class TestCompileCache:
    """enable_compile_cache (utils/compile_cache.py) is shared by every CLI
    entry; the env overrides let the test harness redirect the cache."""

    def test_env_overrides_and_defaults(self, tmp_path, monkeypatch):
        import jax

        from mapdit_tpu.utils.compile_cache import enable_compile_cache

        old_dir = jax.config.jax_compilation_cache_dir
        old_min = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            monkeypatch.setenv("MAPDIT_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
            monkeypatch.setenv("MAPDIT_COMPILE_CACHE_MIN_SECS", "1.5")
            enable_compile_cache()
            assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.5

            monkeypatch.delenv("MAPDIT_COMPILE_CACHE_DIR")
            monkeypatch.delenv("MAPDIT_COMPILE_CACHE_MIN_SECS")
            enable_compile_cache()
            assert jax.config.jax_compilation_cache_dir.endswith("jax_compilation")
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0
        finally:
            jax.config.update("jax_compilation_cache_dir", old_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


class TestRelayHealth:
    def test_probe_fields_and_verdict(self):
        from mapdit_tpu.utils.relay_health import probe_relay

        row = probe_relay(n=3, bulk_mb=1.0)
        for k in ("p50_ms", "p90_ms", "min_ms", "max_ms", "n", "healthy_ms",
                  "platform", "healthy", "bulk_mb", "bulk_mb_s"):
            assert k in row, k
        # CPU backend: sub-ms dispatch and GB/s bulk — healthy by huge margin
        assert row["healthy"] is True
        assert row["bulk_mb_s"] > 1.0

    def test_bulk_leg_disabled(self):
        from mapdit_tpu.utils.relay_health import probe_relay

        row = probe_relay(n=3, bulk_mb=0)
        assert "bulk_mb_s" not in row
        assert row["healthy"] is True

    def test_degraded_threshold(self, monkeypatch):
        from mapdit_tpu.utils import relay_health

        monkeypatch.setenv("MAPDIT_RELAY_HEALTHY_MS", "0.0000001")
        row = relay_health.probe_relay(n=3, bulk_mb=0)
        assert row["healthy"] is False
