"""Serving subsystem tests: drive the real serve.py over HTTP in a
subprocess (CPU), covering the bucket cache, both output formats, seed
determinism, and error surfaces."""

import io
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    ).strip()
    return env


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    results = str(tmp_path_factory.mktemp("results"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--data-path", "synthetic:32", "--results-dir", results,
         "--model", "DiT-XS/8", "--num-classes", "10", "--num-steps", "6",
         "--batch-size", "8", "--log-every", "3", "--ckpt-every", "6",
         "--ema-snapshot-every", "3", "--num-lin-warmup", "2",
         "--start-decay", "4"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=_cpu_env(),
    )
    assert proc.returncode == 0, f"train: {proc.stdout}\n{proc.stderr}"
    exp_dir = os.path.join(results, os.listdir(results)[0])

    srv = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--result-dir", exp_dir, "--port", "0", "--warmup", "false",
         "--buckets", "1,4", "--default-steps", "4", "--coalesce-ms", "150"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=_cpu_env(),
    )
    port = None
    deadline = time.time() + 120
    while time.time() < deadline:
        line = srv.stdout.readline()
        if "listening on http://" in line:
            port = int(line.split("http://")[1].split()[0].rsplit(":", 1)[1])
            break
        if srv.poll() is not None:
            raise AssertionError(f"serve.py exited early:\n{srv.stdout.read()}")
    assert port, "server did not announce its port"
    yield f"http://127.0.0.1:{port}"
    srv.terminate()  # SIGTERM: graceful-shutdown path
    assert srv.wait(timeout=30) == 0, "server should exit 0 on SIGTERM"


def _post(base, payload, timeout=600):
    req = urllib.request.Request(
        base + "/v1/sample",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


class TestServe:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=60) as resp:
            info = json.loads(resp.read())
        assert info["status"] == "ok"
        assert info["model"] == "DiT-XS/8"
        assert info["buckets"] == [1, 4]
        assert info["decode"] == "latent"

    def test_metrics_prometheus(self, server):
        with urllib.request.urlopen(server + "/metrics", timeout=60) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        assert "mapdit_batches_run " in text
        assert "# TYPE mapdit_compiled_programs gauge" in text

    def test_png_grid(self, server):
        status, ctype, body = _post(
            server,
            {"class_label": 3, "num_samples": 3, "steps": 4, "sampler": "dpm++"},
        )
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_npz_format_and_seed_determinism(self, server):
        payload = {
            "class_labels": [1, 2], "steps": 4, "sampler": "ddim",
            "seed": 7, "format": "npz", "cfg_scale": 1.0,
        }
        _, ctype, body1 = _post(server, payload)
        _, _, body2 = _post(server, payload)
        assert ctype == "application/x-npz"
        with np.load(io.BytesIO(body1)) as f1, np.load(io.BytesIO(body2)) as f2:
            a, b = f1["arr_0"], f2["arr_0"]
        assert a.shape == (2, 16, 16, 4) and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)

    def test_bucket_reuse_is_visible(self, server):
        # the two requests above shared (ddim, 4, 1.0, bucket 4); healthz
        # counts compiled programs, so it must be < number of requests made
        with urllib.request.urlopen(server + "/healthz", timeout=60) as resp:
            info = json.loads(resp.read())
        assert 1 <= info["compiled_programs"] <= 2

    def test_coalescing_and_invariance(self, server):
        """Concurrent same-protocol requests merge into one device batch;
        per-request z keys make deterministic-sampler outputs identical
        whether a request ran alone or coalesced."""
        import threading

        proto = {"steps": 4, "sampler": "dpm++", "cfg_scale": 1.0, "format": "npz"}
        solo = _post(server, {**proto, "class_labels": [5], "seed": 11})[2]

        results = {}
        barrier = threading.Barrier(3)

        def fire(name, seed):
            barrier.wait()
            results[name] = _post(
                server, {**proto, "class_labels": [5], "seed": seed}
            )[2]

        threads = [
            threading.Thread(target=fire, args=(n, s))
            for n, s in (("a", 11), ("b", 12), ("c", 13))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        with np.load(io.BytesIO(solo)) as f1, np.load(io.BytesIO(results["a"])) as f2:
            np.testing.assert_array_equal(f1["arr_0"], f2["arr_0"])
        # different seeds produce different rows even inside one batch
        with np.load(io.BytesIO(results["a"])) as fa, np.load(io.BytesIO(results["b"])) as fb:
            assert not np.array_equal(fa["arr_0"], fb["arr_0"])

        with urllib.request.urlopen(server + "/healthz", timeout=60) as resp:
            info = json.loads(resp.read())
        assert info["coalesced_batches"] >= 1, info

    def test_sharded_serving_virtual_mesh(self, tmp_path):
        """--shard over the 8-device virtual mesh: divisible buckets run
        data-parallel (GSPMD splits the chain batch)."""
        env = _cpu_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        results = str(tmp_path)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--data-path", "synthetic:32", "--results-dir", results,
             "--model", "DiT-XS/8", "--num-classes", "10", "--num-steps", "4",
             "--batch-size", "8", "--log-every", "2", "--ckpt-every", "4",
             "--ema-snapshot-every", "2"],
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
        )
        assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
        exp_dir = os.path.join(results, os.listdir(results)[0])
        srv = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "--result-dir", exp_dir, "--port", "0", "--warmup", "false",
             "--buckets", "8", "--shard", "true"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        try:
            port = None
            deadline = time.time() + 120
            while time.time() < deadline:
                line = srv.stdout.readline()
                if "listening on http://" in line:
                    port = int(line.split("http://")[1].split()[0].rsplit(":", 1)[1])
                    break
                if srv.poll() is not None:
                    raise AssertionError(f"serve.py exited:\n{srv.stdout.read()}")
            assert port
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                info = json.loads(resp.read())
            assert info["devices"] == 8
            # CFG batch: 16 rows over 8 devices
            status, ctype, body = _post(
                base,
                {"class_label": 1, "num_samples": 8, "steps": 4,
                 "sampler": "dpm++", "cfg_scale": 4.0, "format": "npz"},
            )
            assert status == 200
            with np.load(io.BytesIO(body)) as f:
                assert f["arr_0"].shape == (8, 16, 16, 4)
        finally:
            srv.terminate()
            srv.wait(timeout=30)

    def test_seed_determinism_header(self, server):
        """Responses disclose whether the seed fully determines the output
        (stochastic ddpm chains share per-step noise across the coalesced
        batch; deterministic samplers do not)."""
        req = urllib.request.Request(
            server + "/v1/sample",
            data=json.dumps(
                {"class_label": 1, "steps": 4, "sampler": "dpm++", "seed": 3}
            ).encode(),
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.headers["X-Seed-Deterministic"] == "true"
        req = urllib.request.Request(
            server + "/v1/sample",
            data=json.dumps(
                {"class_label": 1, "steps": 4, "sampler": "ddpm", "seed": 3}
            ).encode(),
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.headers["X-Seed-Deterministic"] == "false"
        with urllib.request.urlopen(server + "/healthz", timeout=60) as resp:
            info = json.loads(resp.read())
        assert info["seed_deterministic_samplers"] == ["dpm++", "ddim"]

    def test_errors(self, server):
        for payload, frag in [
            ({"class_label": 99, "steps": 4}, "class label"),
            ({"class_label": 1, "num_samples": 64}, "bucket"),
            ({"class_label": 1, "steps": 4, "sampler": "euler"}, "sampler"),
            ({"class_label": 1, "num_samples": 0}, ">= 1"),
            ({"class_label": 1, "steps": 4, "seed": "abc"}, "seed"),
            ({"class_label": 1, "steps": 4, "format": "jpeg"}, "format"),
            ({"class_label": 1, "steps": 4, "schedule": "exp"}, "schedule"),
            # malformed value *types* must be 400s, not 500s
            ({"class_labels": 5, "steps": 4}, "list"),
            ({"class_labels": {"a": 1}, "steps": 4}, "list"),
            ({"class_label": 1, "num_samples": [2], "steps": 4}, ""),
            ({"class_label": [1], "steps": 4}, ""),
        ]:
            try:
                _post(server, payload)
                raise AssertionError(f"expected 400 for {payload}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert frag in json.loads(e.read())["error"]

        try:
            urllib.request.urlopen(server + "/nope", timeout=60)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
