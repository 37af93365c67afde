"""Frechet-distance math tests (tools/fid.py); the Inception extractor is
gated on locally cached weights and not exercised offline."""

import importlib.util
import os

import numpy as np
import pytest

spec = importlib.util.spec_from_file_location(
    "fid", os.path.join(os.path.dirname(__file__), "..", "tools", "fid.py")
)
fid = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fid)


class TestFrechet:
    def test_identical_gaussians_zero(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(500, 16))
        mu, s = fid.activation_stats(f)
        assert abs(fid.frechet_distance(mu, s, mu, s)) < 1e-6

    def test_mean_shift_closed_form(self):
        d = 8
        mu1, mu2 = np.zeros(d), np.full(d, 2.0)
        s = np.eye(d)
        # same covariance: FID = ||dmu||^2
        np.testing.assert_allclose(fid.frechet_distance(mu1, s, mu2, s), 4.0 * d, rtol=1e-8)

    def test_isotropic_scale_closed_form(self):
        d = 5
        mu = np.zeros(d)
        s1, s2 = np.eye(d), 4.0 * np.eye(d)
        # Tr(I + 4I - 2*2I) = d(1 + 4 - 4) = d
        np.testing.assert_allclose(fid.frechet_distance(mu, s1, mu, s2), d, rtol=1e-8)

    def test_sampled_estimate_converges(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(5000, 4))
        b = rng.normal(size=(5000, 4)) + np.array([1.0, 0, 0, 0])
        mu1, s1 = fid.activation_stats(a)
        mu2, s2 = fid.activation_stats(b)
        val = fid.frechet_distance(mu1, s1, mu2, s2)
        assert 0.8 < val < 1.2, val


class TestRandomProjFeatures:
    def test_deterministic_and_shaped(self):
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 256, (20, 16, 16, 4), dtype=np.uint8)
        a = fid.random_projection_features(imgs)
        b = fid.random_projection_features(imgs)
        assert a.shape == (20, 64)
        np.testing.assert_array_equal(a, b)

    def test_self_fid_zero_and_shift_positive(self):
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (200, 16, 16, 4), dtype=np.uint8)
        shifted = np.clip(imgs.astype(np.int16) + 60, 0, 255).astype(np.uint8)
        mu, s = fid.activation_stats(fid.random_projection_features(imgs))
        mu2, s2 = fid.activation_stats(fid.random_projection_features(shifted))
        assert abs(fid.frechet_distance(mu, s, mu, s)) < 1e-6
        assert fid.frechet_distance(mu, s, mu2, s2) > 0.1


class TestKid:
    """kid_score: unbiased polynomial-kernel MMD^2 (arXiv 1801.01401)."""

    def test_same_distribution_near_zero_different_positive(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(400, 16))
        b = rng.normal(size=(400, 16))           # same distribution
        c = rng.normal(size=(400, 16)) + 0.5     # mean-shifted
        same_mean, same_std = fid.kid_score(a, b, subset_size=200, n_subsets=20)
        diff_mean, _ = fid.kid_score(a, c, subset_size=200, n_subsets=20)
        # unbiased estimator: same-distribution value straddles zero within
        # a few subset stds; a real shift separates by far more
        assert abs(same_mean) < max(5 * same_std, 0.05), (same_mean, same_std)
        assert diff_mean > 10 * max(same_mean, same_std), (diff_mean, same_mean)

    def test_deterministic_in_seed(self):
        rng = np.random.default_rng(5)
        a, b = rng.normal(size=(100, 8)), rng.normal(size=(100, 8))
        assert fid.kid_score(a, b, 50, 5, seed=1) == fid.kid_score(a, b, 50, 5, seed=1)
        assert fid.kid_score(a, b, 50, 5, seed=1) != fid.kid_score(a, b, 50, 5, seed=2)

    def test_unbiased_at_small_n_where_fid_is_not(self):
        """The reason KID is in the toolbox: at N=50 draws from ONE
        distribution, sampled FID is large (covariance bias) while KID
        stays near zero."""
        rng = np.random.default_rng(6)
        a, b = rng.normal(size=(50, 32)), rng.normal(size=(50, 32))
        mu1, s1 = fid.activation_stats(a)
        mu2, s2 = fid.activation_stats(b)
        fid_val = fid.frechet_distance(mu1, s1, mu2, s2)
        kid_val, kid_std = fid.kid_score(a, b, subset_size=50, n_subsets=10)
        assert fid_val > 1.0, fid_val          # heavily biased at N=50
        assert abs(kid_val) < 0.1, kid_val     # unbiased stays near zero


class TestPrecisionRecall:
    """Improved precision/recall (arXiv 1904.06991): the fidelity vs
    diversity split."""

    def test_same_distribution_high_both(self):
        rng = np.random.default_rng(7)
        real = rng.normal(size=(300, 8))
        fake = rng.normal(size=(300, 8))
        p, r = fid.precision_recall(real, fake)
        assert p > 0.8 and r > 0.8, (p, r)

    def test_mode_collapse_high_precision_low_recall(self):
        """Fakes concentrated in a tiny region of the real distribution:
        every fake is near real support (precision high) but most reals
        have no fake nearby (recall low) — the axis a scalar FID folds."""
        rng = np.random.default_rng(8)
        real = rng.normal(size=(300, 8))
        fake = rng.normal(size=(300, 8)) * 0.05  # collapsed to the mode
        p, r = fid.precision_recall(real, fake)
        assert p > 0.9, p
        assert r < 0.4, r

    def test_off_manifold_low_precision(self):
        rng = np.random.default_rng(9)
        real = rng.normal(size=(300, 8))
        fake = rng.normal(size=(300, 8)) + 10.0  # far off-support
        p, _ = fid.precision_recall(real, fake)
        assert p < 0.05, p
