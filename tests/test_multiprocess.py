"""Real 2-process data-parallel training on CPU (SURVEY.md §4.5 extended):
brings up `jax.distributed` with an explicit coordinator, feeds disjoint
per-process batch slices (shared-shuffle partition, tests/test_data.py),
assembles global batches via `make_array_from_process_local_data`, and
writes artifacts only on process 0."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_cluster(results, extra_args, n_procs=2):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon registration
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["MAPDIT_COORDINATOR"] = f"localhost:{port}"
        env["MAPDIT_NUM_PROCESSES"] = str(n_procs)
        env["MAPDIT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.join(REPO, "train.py"),
                    "--data-path", "synthetic:64",
                    "--results-dir", results,
                    "--model", "DiT-XS/8",
                    "--num-classes", "10",
                    "--num-steps", "6",
                    "--batch-size", "16",
                    "--log-every", "3",
                    "--ckpt-every", "6",
                    "--ema-snapshot-every", "3",
                    "--num-lin-warmup", "2",
                    "--start-decay", "5",
                    # loss-second-moment keeps per-t loss history in the
                    # train state: under multi-process GSPMD its update is a
                    # cross-device collective — exercises the reference's
                    # dist.all_gather contract (timestep_sampler.py:82-103)
                    # on a real 2-process mesh, not just in-mesh shard_map.
                    "--timestep-sampler", "loss-second-moment",
                    # orbax saves are collective barriers all processes must
                    # join — this exercises that on a real 2-process cluster
                    "--checkpointer", "orbax",
                    "--multihost", "true",
                ] + extra_args,
                cwd=REPO, env=env, text=True,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    return procs


def _drain_cluster(procs):
    # Drain all pipes CONCURRENTLY: the processes block on each other's
    # collectives, so sequentially communicate()-ing one while another
    # fills its 64 KB stdout pipe can deadlock the whole cluster.
    import threading

    outs = [None] * len(procs)

    def drain(i, p):
        outs[i] = p.communicate(timeout=900)[0]

    threads = [
        threading.Thread(target=drain, args=(i, p)) for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=910)
    return outs


def _run_two_process(results, extra_args):
    procs = _launch_cluster(results, extra_args)
    outs = _drain_cluster(procs)
    assert all(p.returncode == 0 for p in procs), "\n\n".join(
        o or "" for o in outs
    )
    return outs


def _check_artifacts(results):
    # Only process 0 created an experiment directory and wrote artifacts.
    exps = os.listdir(results)
    assert len(exps) == 1, exps
    exp = os.path.join(results, exps[0])
    log = open(os.path.join(exp, "log.txt")).read()
    assert "devices: 2x" in log  # both processes joined the mesh
    assert "train loss:" in log
    assert os.path.isdir(os.path.join(exp, "checkpoints", "0000006.orbax"))
    snaps = os.listdir(os.path.join(exp, "ema"))
    assert len(snaps) == 4, snaps  # 2 stds x steps {3, 6}, written once


def test_two_process_train(tmp_path):
    results = str(tmp_path / "results")
    _run_two_process(results, [])
    _check_artifacts(results)


def test_two_process_preemption(tmp_path):
    """SIGTERM to ONE process stops the WHOLE cluster cleanly: the local
    preemption flags are OR-combined at synchronized log boundaries, both
    processes leave the collective loop at the same step, join the
    collective orbax save, and exit 0 (train.py graceful preemption)."""
    import signal
    import time

    results = str(tmp_path / "results")
    procs = _launch_cluster(
        results,
        [
            "--num-steps", "100000",   # would run ~forever without the signal
        ],
    )
    import threading

    outs = [None, None]

    def drain(i, p):
        outs[i] = p.communicate(timeout=900)[0]

    threads = [
        threading.Thread(target=drain, args=(i, p)) for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    try:
        # wait for real training progress, then preempt the NON-lead only
        logfile, deadline = None, time.time() + 600
        while time.time() < deadline:
            exps = os.listdir(results) if os.path.isdir(results) else []
            if exps:
                lf = os.path.join(results, exps[0], "log.txt")
                if os.path.exists(lf) and "(step=" in open(lf).read():
                    logfile = lf
                    break
            assert all(p.poll() is None for p in procs), "cluster died early"
            time.sleep(0.5)
        assert logfile, "no training progress within deadline"
        procs[1].send_signal(signal.SIGTERM)
        for t in threads:
            t.join(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n\n".join(
        o or "" for o in outs
    )
    log = open(logfile).read()
    assert "graceful stop at step" in log
    exp = os.path.dirname(logfile)
    ckpts = [c for c in os.listdir(os.path.join(exp, "checkpoints"))]
    assert ckpts, "no preemption checkpoint written"
    assert all(int(c.split(".")[0]) < 100000 for c in ckpts)


def test_four_process_preemption(tmp_path):
    """4-rank cluster with SIGTERM to a MIDDLE rank mid-run (VERDICT r03 #6):
    at n=4 the preemption OR-reduction, the orbax save barrier, and the init
    watchdog all have strictly more interleavings than n=2 — uneven signal
    arrival must still produce a single synchronized graceful stop with every
    rank joining the collective checkpoint and exiting 0."""
    import signal
    import threading
    import time

    results = str(tmp_path / "results")
    procs = _launch_cluster(
        results,
        ["--num-steps", "100000"],
        n_procs=4,
    )
    outs = [None] * len(procs)

    def drain(i, p):
        outs[i] = p.communicate(timeout=900)[0]

    threads = [
        threading.Thread(target=drain, args=(i, p)) for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    try:
        logfile, deadline = None, time.time() + 600
        while time.time() < deadline:
            exps = os.listdir(results) if os.path.isdir(results) else []
            if exps:
                lf = os.path.join(results, exps[0], "log.txt")
                if os.path.exists(lf) and "(step=" in open(lf).read():
                    logfile = lf
                    break
            assert all(p.poll() is None for p in procs), "cluster died early"
            time.sleep(0.5)
        assert logfile, "no training progress within deadline"
        procs[2].send_signal(signal.SIGTERM)  # a non-lead, non-last rank
        for t in threads:
            t.join(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n\n".join(
        o or "" for o in outs
    )
    log = open(logfile).read()
    assert "devices: 4x" in log  # all four ranks joined the mesh
    assert "graceful stop at step" in log
    exp = os.path.dirname(logfile)
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert ckpts, "no preemption checkpoint written"
    assert all(int(c.split(".")[0]) < 100000 for c in ckpts)


def test_two_process_train_fsdp(tmp_path):
    """FSDP across REAL process boundaries: param/opt/EMA shards live on
    different hosts' devices; orbax checkpoints are collective shard-aware
    saves and EMA snapshots re-replicate via an all-process jit before the
    lead writes them."""
    results = str(tmp_path / "results")
    _run_two_process(results, ["--fsdp", "true"])
    _check_artifacts(results)
