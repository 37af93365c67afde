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
def trained_exp(trained_run):
    return trained_run  # the session-scoped shared experiment (conftest.py)


def _drain(pipe):
    """Keep consuming a server's stdout so it can never fill the 64 KB pipe
    buffer and block the process mid-write (a real deadlock we hit: the
    dispatcher thread froze in anon_pipe_write while pytest polled the
    socket forever)."""
    import threading

    def consume():
        for _ in pipe:
            pass

    threading.Thread(target=consume, daemon=True).start()


def _start_server(exp_dir, extra_args=(), extra_env=None):
    env = _cpu_env()
    env.update(extra_env or {})
    srv = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--result-dir", exp_dir, "--port", "0", "--warmup", "false",
         *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env,
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
    _drain(srv.stdout)
    return srv, f"http://127.0.0.1:{port}"


@pytest.fixture(scope="module")
def server(trained_exp):
    srv, base = _start_server(
        trained_exp,
        ["--buckets", "1,4", "--default-steps", "4", "--coalesce-ms", "150"],
    )
    yield base
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
        assert "mapdit_request_latency_seconds_sum " in text
        assert "mapdit_request_latency_seconds_count " in text
        assert "mapdit_chain_seconds_sum " in text
        assert "mapdit_chain_seconds_count " in text

    def test_latency_counters_advance(self, server):
        info0 = json.loads(urllib.request.urlopen(server + "/healthz", timeout=60).read())
        # same protocol as the png/npz tests below: test_bucket_reuse_is_visible
        # asserts the module-wide compiled-program count stays at <= 2
        _post(server, {"class_labels": [1, 2], "steps": 4,
                       "sampler": "ddim", "cfg_scale": 1.0})
        info1 = json.loads(urllib.request.urlopen(server + "/healthz", timeout=60).read())
        assert info1["request_latency_seconds_count"] > info0["request_latency_seconds_count"]
        assert info1["request_latency_seconds_sum"] > info0["request_latency_seconds_sum"]
        assert info1["request_latency_seconds_max"] > 0
        # the FIRST call of a compiled program lands in the compile
        # counters (ADVICE r04: XLA compile must not skew chain_seconds);
        # only repeat calls advance the steady-state chain window
        assert (
            info1["compile_seconds_count"] + info1["chain_seconds_count"]
            > info0["compile_seconds_count"] + info0["chain_seconds_count"]
        )
        _post(server, {"class_labels": [1, 2], "steps": 4,
                       "sampler": "ddim", "cfg_scale": 1.0})
        info2 = json.loads(urllib.request.urlopen(server + "/healthz", timeout=60).read())
        assert info2["chain_seconds_count"] > info1["chain_seconds_count"]
        assert info2["chain_seconds_sum"] > info1["chain_seconds_sum"]

    def test_png_grid(self, server):
        status, ctype, body = _post(
            server,
            {"class_label": 3, "num_samples": 3, "steps": 4, "sampler": "dpm++"},
        )
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_unipc_protocol(self, server):
        status, ctype, body = _post(
            server,
            {"class_label": 5, "num_samples": 2, "steps": 4,
             "sampler": "unipc", "cfg_scale": 1.0},
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
        # the tests above issued >= 5 requests over exactly three protocols
        # (ddim / dpm++ / unipc at bucket 4) — reuse means the compiled-
        # program count tracks protocols, not requests
        with urllib.request.urlopen(server + "/healthz", timeout=60) as resp:
            info = json.loads(resp.read())
        assert 1 <= info["compiled_programs"] <= 3
        assert info["batches_run"] > info["compiled_programs"]

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

    def test_sharded_serving_virtual_mesh(self, trained_exp):
        """--shard over the 8-device virtual mesh: divisible buckets run
        data-parallel — shard_map per-shard chains for exact protocols (the
        layout that keeps Pallas kernels live on a real pod), GSPMD for
        cached ones. Serves the shared 1-device-trained experiment — device
        count is a serving-time property, not a checkpoint property."""
        env = _cpu_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        exp_dir = trained_exp
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
            _drain(srv.stdout)
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

    def test_tensor_parallel_serving_virtual_mesh(self, trained_exp):
        """--n-model 2 over the 8-device virtual mesh (dp4 x tp2): every
        chain model call splits its matmuls over the 'model' axis — the
        latency layout for small buckets (see build_sample_fn mesh=)."""
        env = _cpu_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        srv = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "--result-dir", trained_exp, "--port", "0", "--warmup", "false",
             "--buckets", "4", "--shard", "true", "--n-model", "2"],
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
            _drain(srv.stdout)
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                info = json.loads(resp.read())
            assert info["devices"] == 8
            assert info["mesh"] == {"data": 4, "model": 2}
            status, ctype, body = _post(
                base,
                {"class_label": 1, "num_samples": 4, "steps": 4,
                 "sampler": "dpm++", "cfg_scale": 4.0, "format": "npz"},
            )
            assert status == 200
            with np.load(io.BytesIO(body)) as f:
                assert f["arr_0"].shape == (4, 16, 16, 4)
            # non-divisible bucket fill (1 sample in the 4-bucket): the TP
            # program still runs under the mesh (batch replicated if the
            # padded rows divide, which they do at bucket 4)
            status, _, body = _post(
                base,
                {"class_label": 2, "num_samples": 1, "steps": 4,
                 "sampler": "dpm++", "cfg_scale": 4.0, "format": "npz"},
            )
            assert status == 200
            with np.load(io.BytesIO(body)) as f:
                assert f["arr_0"].shape == (1, 16, 16, 4)
            # cached protocols are rejected on a TP server (the cached
            # builder has no TP support — would duplicate work over 'model')
            try:
                _post(base,
                      {"class_label": 2, "num_samples": 1, "steps": 4,
                       "sampler": "dpm++", "cache_interval": 2,
                       "cfg_scale": 1.0})
                raise AssertionError("expected 400 for cache on a TP server")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "tensor-parallel" in json.loads(e.read())["error"]
        finally:
            srv.terminate()
            srv.wait(timeout=30)

    def test_cache_interval_protocol(self, server):
        """Delta-DiT span caching is a first-class serving protocol knob
        (VERDICT r02 item #4): a cached dpm++ request runs end-to-end."""
        # cache_mode pinned explicitly: the request default is forecast
        # (r04 trained-weight arbitration), and this test needs both modes
        status, ctype, body = _post(
            server,
            {"class_label": 2, "steps": 4, "sampler": "dpm++",
             "cache_interval": 2, "cfg_scale": 1.0, "format": "npz",
             "seed": 5, "cache_mode": "hold"},
        )
        assert status == 200 and ctype == "application/x-npz"
        with np.load(io.BytesIO(body)) as f:
            cached = f["arr_0"]
        assert cached.shape == (1, 16, 16, 4)
        # and it is a distinct program from the exact chain: same request
        # without caching differs (lossy approximation)
        _, _, body2 = _post(
            server,
            {"class_label": 2, "steps": 4, "sampler": "dpm++",
             "cfg_scale": 1.0, "format": "npz", "seed": 5},
        )
        with np.load(io.BytesIO(body2)) as f:
            exact = f["arr_0"]
        assert not np.array_equal(cached, exact)

        # forecast mode: a distinct program with a distinct (finite) result
        status, _, body3 = _post(
            server,
            {"class_label": 2, "steps": 4, "sampler": "dpm++",
             "cache_interval": 2, "cfg_scale": 1.0, "format": "npz",
             "seed": 5, "cache_mode": "forecast"},
        )
        assert status == 200
        with np.load(io.BytesIO(body3)) as f:
            forecast = f["arr_0"]
        assert not np.array_equal(forecast, cached)
        try:
            _post(server, {"class_label": 1, "steps": 4,
                           "cache_interval": 2, "cache_mode": "extrapolate"})
            raise AssertionError("expected 400 for bad cache_mode")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "cache_mode" in json.loads(e.read())["error"]

        for payload, frag in [
            ({"class_label": 1, "steps": 4, "sampler": "ddim",
              "cache_interval": 2}, "composes"),
            ({"class_label": 1, "steps": 4, "sampler": "ddpm",
              "cache_interval": 3}, "divide"),
            ({"class_label": 1, "steps": 4, "cache_interval": -1}, ">= 0"),
        ]:
            try:
                _post(server, payload)
                raise AssertionError(f"expected 400 for {payload}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert frag in json.loads(e.read())["error"]

    def test_dynamic_threshold_protocol(self, server):
        """Imagen-style dynamic thresholding is a serving protocol knob:
        percentile 1.0 is the bit-exact no-op limit (clip at max|x0|), and
        out-of-range values 400 at admission."""
        base = {"class_label": 2, "steps": 4, "sampler": "dpm++",
                "cfg_scale": 1.0, "format": "npz", "seed": 5}
        _, _, body = _post(server, dict(base, dynamic_threshold=1.0))
        with np.load(io.BytesIO(body)) as f:
            thresholded = f["arr_0"]
        _, _, body2 = _post(server, base)
        with np.load(io.BytesIO(body2)) as f:
            exact = f["arr_0"]
        np.testing.assert_array_equal(thresholded, exact)
        for bad in (0.0, -0.5, 1.5, "high"):
            try:
                _post(server, dict(base, dynamic_threshold=bad))
                raise AssertionError(f"expected 400 for {bad!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "dynamic_threshold" in json.loads(e.read())["error"]

    def test_cfg_interval_protocol(self, server):
        """Limited-interval guidance is a serving protocol knob: the
        full-sigma interval reproduces the plain CFG program (exactness
        limit), and malformed/incompatible intervals 400 at admission."""
        base = {"class_label": 2, "num_samples": 2, "steps": 4,
                "sampler": "dpm++", "cfg_scale": 4.0, "format": "npz",
                "seed": 9}
        status, ctype, body = _post(
            server, dict(base, cfg_interval=[0.0, 1e9])
        )
        assert status == 200 and ctype == "application/x-npz"
        with np.load(io.BytesIO(body)) as f:
            seg = f["arr_0"].astype(np.int16)
        _, _, body2 = _post(server, base)
        with np.load(io.BytesIO(body2)) as f:
            exact = f["arr_0"].astype(np.int16)
        # same math, different compiled program: only fusion noise at the
        # uint8 quantization boundary may separate them
        assert np.abs(seg - exact).max() <= 1

        # stacks with Delta-DiT span caching (three cached group-scans)
        status, ctype, _ = _post(
            server, dict(base, cfg_interval=[0.3, 3.0], cache_interval=2)
        )
        assert status == 200 and ctype == "application/x-npz"

        for payload, frag in [
            (dict(base, cfg_interval=[0.3]), "two numbers"),
            (dict(base, cfg_interval=[3.0, 0.3]), "sigma_lo <= sigma_hi"),
            (dict(base, cfg_interval=[0.3, 3.0], cfg_scale=1.0),
             "cfg_scale > 1"),
            (dict(base, cfg_interval=[0.3, 3.0], sampler="ddim"), "composes"),
        ]:
            try:
                _post(server, payload)
                raise AssertionError(f"expected 400 for {payload}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert frag in json.loads(e.read())["error"]

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
        assert info["seed_deterministic_samplers"] == ["dpm++", "unipc", "ddim"]

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

    def test_mixed_protocol_concurrent_load(self, server):
        """Concurrent distinct protocols: every request completes (the
        dispatcher round-robins across protocol queues; compiles are
        serialized but bounded), nothing 500s."""
        import threading

        protos = [
            {"class_label": 1, "steps": 4, "sampler": "dpm++", "cfg_scale": 1.0},
            {"class_label": 2, "steps": 4, "sampler": "ddim", "cfg_scale": 1.0},
            {"class_label": 3, "steps": 4, "sampler": "ddpm", "cfg_scale": 4.0},
        ]
        results = {}

        def fire(i):
            p = {**protos[i % len(protos)], "format": "npz", "seed": i}
            try:
                results[i] = _post(server, p)[0]
            except urllib.error.HTTPError as e:  # any HTTP error is a failure
                results[i] = e.code

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(code == 200 for code in results.values()), results


class TestBackpressure:
    """Bounded queues + per-request deadlines (VERDICT r02 item #6): the
    server sheds load with 503/504 instead of queueing without bound or
    letting compile storms wedge the dispatcher."""

    def test_warmup_protocols_flag(self, trained_exp):
        """--warmup-protocols precompiles arbitrary protocol dicts at
        startup (incl. cfg_interval), so production protocols never pay a
        first-request compile."""
        srv, base = _start_server(
            trained_exp,
            ["--warmup-protocols",
             '[{"steps": 2, "sampler": "dpm++", "cfg_scale": 4.0, '
             '"cfg_interval": [0.3, 3.0]}]'],
        )
        try:
            info = json.loads(
                urllib.request.urlopen(base + "/healthz", timeout=60).read()
            )
            assert info["compiled_programs"] >= 1
            status, _, _ = _post(
                base,
                {"class_label": 1, "num_samples": 1, "steps": 2,
                 "sampler": "dpm++", "cfg_scale": 4.0,
                 "cfg_interval": [0.3, 3.0], "format": "npz"},
            )
            assert status == 200
            info2 = json.loads(
                urllib.request.urlopen(base + "/healthz", timeout=60).read()
            )
            # the request reused the warmed program (same bucket: n=1 pads
            # into the warmed largest bucket only if buckets match — count
            # may grow by one bucket specialization at most)
            assert info2["compiled_programs"] <= info["compiled_programs"] + 1
        finally:
            srv.terminate()
            srv.wait(timeout=30)

    def test_fused_preamble_serving(self, trained_exp):
        """--preamble fused (VERDICT r04 #8): the whole request preamble
        (per-row key derivation, z draws, CFG doubling, chain key) runs
        inside the jitted chain — one device dispatch per request. Checks:
        200s across protocols, seed determinism under the new per-row
        contract, batch-composition invariance of seeded requests, and the
        preamble advertised in /healthz."""
        srv, base = _start_server(
            trained_exp,
            ["--preamble", "fused", "--buckets", "1,4",
             "--default-steps", "4"],
        )
        try:
            info = json.loads(
                urllib.request.urlopen(base + "/healthz", timeout=60).read()
            )
            assert info["preamble"] == "fused"
            payload = {
                "class_labels": [1, 2], "steps": 4, "sampler": "ddim",
                "seed": 7, "format": "npz", "cfg_scale": 1.0,
            }
            status, ctype, body1 = _post(base, payload)
            assert status == 200 and ctype == "application/x-npz"
            _, _, body2 = _post(base, payload)
            with np.load(io.BytesIO(body1)) as f1, np.load(io.BytesIO(body2)) as f2:
                a, b = f1["arr_0"], f2["arr_0"]
            assert a.shape == (2, 16, 16, 4)
            np.testing.assert_array_equal(a, b)

            # composition invariance: row 0 of a seeded request must be
            # identical whether it runs alone (bucket 1) or inside a
            # larger request (bucket 4, padded) — per-row keys are
            # fold_in(fold_in(zroot, seed), row), independent of batch
            # position and padding by construction
            one = {"class_labels": [1], "steps": 4, "sampler": "ddim",
                   "seed": 3, "format": "npz", "cfg_scale": 1.0}
            _, _, alone = _post(base, one)
            _, _, pair = _post(base, dict(one, class_labels=[1, 1]))
            with np.load(io.BytesIO(alone)) as f1, np.load(io.BytesIO(pair)) as f2:
                np.testing.assert_array_equal(f1["arr_0"][0], f2["arr_0"][0])

            # CFG-doubled protocol also serves (in-jit doubling branch)
            status, _, _ = _post(
                base,
                {"class_label": 1, "num_samples": 1, "steps": 4,
                 "sampler": "dpm++", "cfg_scale": 4.0, "format": "npz"},
            )
            assert status == 200

            # 63-bit seeds ride as two uint32 halves: a seed past 2^32
            # must neither crash (numpy 2.x OverflowError) nor alias the
            # truncated seed (r05 review finding)
            big = dict(one, seed=2**40 + 3)
            status, _, body_big = _post(base, big)
            assert status == 200
            _, _, body_small = _post(base, dict(one, seed=3))
            with np.load(io.BytesIO(body_big)) as f1, np.load(
                io.BytesIO(body_small)
            ) as f2:
                assert not np.array_equal(f1["arr_0"], f2["arr_0"])
        finally:
            srv.terminate()
            assert srv.wait(timeout=30) == 0

    def test_queue_overflow_503(self, trained_exp):
        import threading

        srv, base = _start_server(
            trained_exp,
            ["--buckets", "1", "--coalesce-ms", "900", "--max-pending", "1"],
        )
        try:
            codes = {}

            def fire(name, delay):
                time.sleep(delay)
                try:
                    codes[name] = _post(
                        base,
                        {"class_label": 1, "steps": 2, "sampler": "dpm++",
                         "cfg_scale": 1.0},
                    )[0]
                except urllib.error.HTTPError as e:
                    codes[name] = e.code
                    if e.code == 503:
                        assert e.headers.get("Retry-After")

            # A enqueues; the dispatcher sleeps coalesce_ms=900 before
            # taking it, so B (fired 300ms later) hits the pending cap
            threads = [
                threading.Thread(target=fire, args=("a", 0.0)),
                threading.Thread(target=fire, args=("b", 0.3)),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sorted(codes.values()) == [200, 503], codes
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                info = json.loads(resp.read())
            assert info["rejected"] >= 1
            assert info["pending"] == 0
        finally:
            srv.terminate()
            srv.wait(timeout=30)

    def test_request_timeout_504_and_recovery(self, trained_exp, tmp_path):
        import threading

        # A private EMPTY compile-cache dir: the test's premise is that the
        # first request pays a multi-second XLA compile; the suite-shared
        # warm cache (conftest MAPDIT_COMPILE_CACHE_DIR) would finish it
        # inside the 1.5 s deadline and return 200 instead of 504.
        srv, base = _start_server(
            trained_exp,
            ["--buckets", "1", "--coalesce-ms", "0",
             "--request-timeout-s", "1.5"],
            extra_env={"MAPDIT_COMPILE_CACHE_DIR": str(tmp_path / "cold-cache")},
        )
        try:
            codes = {}

            def fire(name, delay):
                time.sleep(delay)
                try:
                    codes[name] = _post(
                        base,
                        {"class_label": 1, "steps": 2, "sampler": "dpm++",
                         "cfg_scale": 1.0},
                    )[0]
                except urllib.error.HTTPError as e:
                    codes[name] = e.code

            # first request pays a multi-second XLA compile -> 504; the
            # second times out while QUEUED behind it and must be skipped
            # by the dispatcher (abandoned), never run
            threads = [
                threading.Thread(target=fire, args=("a", 0.0)),
                threading.Thread(target=fire, args=("b", 0.2)),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert codes == {"a": 504, "b": 504}, codes

            # the server recovers: once the compile finishes, the (now
            # cached) protocol completes within the deadline
            deadline = time.time() + 120
            ok = False
            while time.time() < deadline:
                try:
                    status = _post(
                        base,
                        {"class_label": 1, "steps": 2, "sampler": "dpm++",
                         "cfg_scale": 1.0},
                    )[0]
                    if status == 200:
                        ok = True
                        break
                except urllib.error.HTTPError as e:
                    assert e.code == 504, e.code
                time.sleep(2)
            assert ok, "server never recovered after compile finished"
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                info = json.loads(resp.read())
            assert info["timeouts"] >= 2
            # the abandoned queued job was skipped: only the compile batch
            # and the successful retry actually ran
            assert info["batches_run"] <= 2 + 1, info
        finally:
            srv.terminate()
            srv.wait(timeout=30)

    def test_compile_budget_admission_400(self, trained_exp):
        srv, base = _start_server(
            trained_exp,
            ["--buckets", "1", "--coalesce-ms", "0", "--max-programs", "1"],
        )
        try:
            # occupy the single program slot
            status = _post(
                base,
                {"class_label": 1, "steps": 2, "sampler": "dpm++",
                 "cfg_scale": 1.0},
            )[0]
            assert status == 200
            # a brand-new protocol is rejected AT ADMISSION (no queueing,
            # no compile), while the warmed protocol keeps working
            try:
                _post(base, {"class_label": 1, "steps": 4, "sampler": "dpm++",
                             "cfg_scale": 1.0})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "compile budget" in json.loads(e.read())["error"]
            status = _post(
                base,
                {"class_label": 2, "steps": 2, "sampler": "dpm++",
                 "cfg_scale": 1.0},
            )[0]
            assert status == 200
        finally:
            srv.terminate()
            srv.wait(timeout=30)


class TestDistilledServing:
    """Distilled students through serve.py: the server pins every request to
    the student's own DDIM grid (sampler/steps/cfg in the body are
    normalized), rejects the accelerator fields, and reports the distilled
    protocol on /healthz."""

    def test_distilled_protocol(self, distilled_run):
        final = distilled_run[-1]  # 2-step student, guidance baked at 1.5
        srv, base = _start_server(
            final, ["--buckets", "1,2", "--coalesce-ms", "0"]
        )
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                info = json.loads(resp.read())
            assert info["distilled"] == {
                "steps": 2, "rounds": 2, "baked_cfg_scale": 1.5,
            }

            # wildly different requested protocols normalize onto the ONE
            # student program (no extra compiles)
            s1 = _post(base, {"class_label": 1, "steps": 250,
                              "sampler": "ddpm", "cfg_scale": 4.0,
                              "format": "npz"})
            s2 = _post(base, {"class_label": 1, "steps": 20,
                              "sampler": "dpm++", "cfg_scale": 1.0,
                              "format": "npz"})
            assert s1[0] == 200 and s2[0] == 200
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                assert json.loads(resp.read())["compiled_programs"] == 1

            # accelerator fields are a validation error, not a 500
            try:
                _post(base, {"class_label": 1, "cache_interval": 2})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "distilled" in json.loads(e.read())["error"]
        finally:
            srv.terminate()
            assert srv.wait(timeout=30) == 0
