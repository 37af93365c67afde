"""Distribution-recovery probe internals (tools/distribution_probe.py):
dataset/ground-truth consistency, metric contracts, JSON sanitization, and
the law's conditioning-signal analysis (the r03s7 degeneracy finding —
label conditioning in the MoG probe family is informationally negligible,
so label_acc ~ chance after training is expected, not a bug)."""

import importlib.util
import json
import os

import numpy as np
import pytest

spec = importlib.util.spec_from_file_location(
    "distribution_probe",
    os.path.join(os.path.dirname(__file__), "..", "tools", "distribution_probe.py"),
)
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)


class TestMakeData:
    def test_ground_truth_matches_artifacts(self, tmp_path):
        gt = probe.make_data(str(tmp_path), classes=4, examples=512, input_size=8)
        assert gt["class_means"].shape == (4, 4)
        assert np.isfinite(gt["class_means"]).all()
        # empirical class means track the analytic centers at this N
        err = np.abs(gt["class_means"] - gt["centers"]).max()
        assert err < 0.15, err
        # the dataset dir is the native artifact family train.py consumes
        from mapdit_tpu.training.data import LatentDataset

        ds = LatentDataset(str(tmp_path))
        assert len(ds) == 512

    def test_empty_class_fails_loudly(self, tmp_path):
        with pytest.raises(AssertionError, match="zero examples"):
            probe.make_data(str(tmp_path), classes=64, examples=8, input_size=8)


class TestDistMetrics:
    def test_exact_law_scores_clean(self):
        rng = np.random.default_rng(0)
        k, m_per, c, s = 4, 256, 4, 8
        centers = rng.normal(size=(k, c)).astype(np.float32)
        gt = {"class_means": centers, "total_std": np.float32(0.3)}
        lat = centers[:, None, :, None, None] + 0.3 * rng.normal(
            size=(k, m_per, c, s, s)
        ).astype(np.float32)
        out = probe.dist_metrics(lat, gt)
        assert out["mean_err"] < 0.05
        assert 0.95 < out["std_ratio"] < 1.05
        assert out["label_acc"] == 1.0
        assert "finite_frac" not in out

    def test_divergent_latents_flagged_and_json_safe(self):
        gt = {
            "class_means": np.ones((2, 4), np.float32),
            "total_std": np.float32(0.3),
        }
        lat = np.full((2, 8, 4, 8, 8), np.nan, np.float32)
        out = probe.dist_metrics(lat, gt)
        assert out["finite_frac"] == 0.0
        text = json.dumps(probe.finite_json(out))
        json.loads(text)  # strict-parseable
        assert "NaN" not in text and "Infinity" not in text


class TestConditioningSignal:
    def test_mog_laws_are_conditioning_degenerate(self):
        """The max extractable label signal in uniform-t eps-MSE is <=~1e-3
        of the O(1) loss for separated AND overlapping MoG laws — pins the
        finding that label_acc ~ chance is the correct-model outcome."""
        rng = np.random.default_rng(1)
        for center_scale, within in [(1.0, 0.33), (0.5, 1.0)]:
            centers = (center_scale * rng.normal(size=(8, 4))).astype(np.float32)
            gt = {"class_means": centers, "total_std": np.float32(within)}
            sig = probe.conditioning_signal(
                gt, within, input_size=16, n=128, t_stride=100
            )
            assert sig["uniform_t_mean"] < 2e-3, (center_scale, within, sig)
            assert sig["max"] < 8e-3, (center_scale, within, sig)


def test_probe_latents_escape_image_clip():
    """The probe consumes RAW denormalized latents: decode_latents must not
    apply the [-1, 1] image clamp in clip=False mode (a law with |mean| ~ 2
    was silently truncated through the default once — BENCH_NOTES r03s9
    'clip artifact'), and the image paths must keep clamping by default."""
    from sample import decode_latents

    ta = {"stats_mean": [0.0] * 4, "stats_std": [2.0] * 4}
    x = np.ones((1, 4, 2, 2), np.float32)  # denormalizes to 2.0
    raw = decode_latents(x, ta, use_vae=False, clip=False)
    assert raw.max() == 2.0
    clipped = decode_latents(x, ta, use_vae=False)
    assert clipped.max() == 1.0


@pytest.mark.slow
def test_end_to_end_learning_loop_recovers_conditioning(tmp_path):
    """The WHOLE loop — make_data -> train.py (subprocess) -> production
    chain builders -> moment/assignment metrics — must learn class
    structure from scratch on CPU. Feasible since the S=8 positive
    control (BENCH_NOTES r03s9): at the raised conditioning ceiling a
    600-step run already assigns ~73% vs 25% chance (measured 0.734 /
    mean_err 1.58 / std 10.8 at this exact budget+seed — thresholds sit
    far from both the measured point and the degenerate baselines:
    random init scores label_acc ~ chance with mean_err ~ 44)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # conftest's 8-virtual-device XLA_FLAGS must not leak in: an 8-way
    # all-reduce on one loaded core can blow the 40 s collective
    # rendezvous inside the train subprocess
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/distribution_probe.py"),
         "--work-dir", str(tmp_path), "--model", "DiT-XS/4",
         "--classes", "4", "--input-size", "8", "--train-steps", "600",
         "--batch-size", "64", "--samples-per-class", "16",
         "--num-sampling-steps", "10", "--examples", "1024",
         "--skip-init-baseline"],
        capture_output=True, text=True, timeout=900, cwd=repo, env=env,
    )
    assert proc.returncode == 0, f"probe:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["label_acc_trained"] >= 0.5, out   # chance = 0.25
    assert out["mean_err_trained"] <= 3.0, out    # random init ~ 44
    assert out["std_ratio_trained"] <= 30.0, out  # random init ~ 1270
