"""Training subsystem tests: EMA math goldens, LR schedule, train step,
checkpoint round-trip, end-to-end smoke (SURVEY.md §4.3, §4.6)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import build_config
from mapdit_tpu.training import (
    create_optimizer,
    create_train_state,
    default_schedule_steps,
    ema_key,
    make_train_step,
    warmup_flat_invsqrt,
)
from mapdit_tpu.training import ema as ema_lib
from mapdit_tpu.training.data import SyntheticLatentDataset


class TestEMAMath:
    def test_std_gamma_golden(self, golden):
        g = golden("ema_math")
        np.testing.assert_allclose(ema_lib.std_to_gamma(g["stds"]), g["gammas"], rtol=1e-9)
        np.testing.assert_allclose(
            ema_lib.gamma_to_std(g["gammas"]), g["roundtrip"], rtol=1e-9
        )
        np.testing.assert_allclose(
            ema_lib.gamma_to_std(ema_lib.std_to_gamma(g["stds"])), g["stds"], rtol=1e-6
        )

    def test_beta_golden(self, golden):
        g = golden("ema_math")
        ts = np.arange(1, 2001)
        np.testing.assert_allclose(ema_lib.calc_beta(0.05, ts), g["beta_005"], rtol=1e-9)
        np.testing.assert_allclose(ema_lib.calc_beta(0.1, ts), g["beta_01"], rtol=1e-9)

    def test_solve_weights_golden(self, golden):
        g = golden("ema_math")
        w = ema_lib.solve_weights(
            g["solve_ts"],
            ema_lib.std_to_gamma(g["solve_in_stds"]),
            np.array([10000.0]),
            ema_lib.std_to_gamma(0.07),
        )
        np.testing.assert_allclose(w, g["solve_weights"], rtol=1e-6)

    def test_posthoc_reconstruction_roundtrip(self, tmp_path):
        """Snapshot a synthetic 'training run' of a scalar pytree under two
        stds, then reconstruct each tracked std — must match the live EMA
        (up to fp16 snapshot quantization)."""
        stds = (0.05, 0.1)

        def trajectory():
            # smooth random-walk parameter trajectory (the regime the
            # power-EMA profile projection is designed for)
            rng = np.random.default_rng(0)
            w = np.zeros((4, 8), np.float32)
            for _ in range(400):
                w = w + 0.05 * rng.normal(size=w.shape).astype(np.float32)
                yield {"w": jnp.asarray(w)}

        emas = {s: {"w": jnp.zeros((4, 8))} for s in stds}
        live_007 = {"w": jnp.zeros((4, 8))}
        ema_dir = str(tmp_path / "ema")
        for step, params in enumerate(trajectory(), start=1):
            for s in stds:
                beta = float(ema_lib.calc_beta(s, step))
                emas[s] = ema_lib.ema_update(emas[s], params, jnp.asarray(beta))
            live_007 = ema_lib.ema_update(
                live_007, params, jnp.asarray(float(ema_lib.calc_beta(0.07, step)))
            )
            if step % 10 == 0:
                for s in stds:
                    ema_lib.save_snapshot(ema_dir, s, step, emas[s])

        # exact-match shortcut path
        rec = ema_lib.calculate_posthoc_ema(0.05, ema_dir)
        np.testing.assert_allclose(rec["w"], np.asarray(emas[0.05]["w"]), atol=2e-3)
        # least-squares path: withhold the final 0.1 snapshot so 0.1 has no
        # exact match, then reconstruct it — ground truth is the live EMA.
        import os

        os.remove(os.path.join(ema_dir, "0.100_0000400.npz"))
        rec = ema_lib.calculate_posthoc_ema(0.1, ema_dir)
        scale = float(np.abs(np.asarray(emas[0.1]["w"])).mean())
        err = float(np.abs(rec["w"] - np.asarray(emas[0.1]["w"])).mean())
        assert err < 0.1 * scale, (err, scale)
        # the 0.07 reconstruction should at least be finite and in-range
        rec007 = ema_lib.calculate_posthoc_ema(0.07, ema_dir)
        assert np.isfinite(rec007["w"]).all()
        assert np.abs(rec007["w"] - np.asarray(live_007["w"])).mean() < 0.2 * scale

    def test_reference_pt_ledger_ingestion(self, tmp_path):
        """calculate_posthoc_ema reads the reference's ``ema/<std>_<step>.pt``
        ledger in place (`src/ema.py:142-155`, fp16 torch state_dicts with
        `_orig_mod.` prefixes): reconstruction from a torch ledger equals
        reconstruction from the equivalent converted .npz ledger — both the
        least-squares path (std 0.07) and the exact-match shortcut (0.05)."""
        import os

        import jax
        import torch

        g = np.load(os.path.join(os.path.dirname(__file__), "golden", "dit_xs2.npz"))
        base = {k[3:]: np.asarray(g[k]) for k in g.files if k.startswith("sd.")}
        pt_dir, npz_dir = str(tmp_path / "pt"), str(tmp_path / "npz")
        os.makedirs(pt_dir)
        ledger = [(0.05, 4, 1.0), (0.1, 4, 0.9), (0.05, 8, 1.1), (0.1, 8, 0.95)]
        for std, step, scale in ledger:
            sd = {
                "_orig_mod." + k: torch.tensor(v * scale).half()
                for k, v in base.items()
            }
            path = os.path.join(pt_dir, f"{std:.3f}_{step:07d}.pt")
            torch.save({"std": std, "t": step, "state_dict": sd}, path)
            ema_lib.save_snapshot(npz_dir, std, step, ema_lib.load_snapshot(path))
        for out_std in (0.07, 0.05):
            a = ema_lib.calculate_posthoc_ema(out_std, pt_dir, verbose=False)
            b = ema_lib.calculate_posthoc_ema(out_std, npz_dir, verbose=False)
            la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            assert len(la) == len(lb) > 10
            for x, y in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_mixed_format_ledger_dedupes(self, tmp_path):
        """The same (std, step) present as BOTH .npz and .pt (e.g. after
        export-ema into the run's own ema/ dir) must not produce duplicate
        snapshots — duplicates make the least-squares Gram matrix singular."""
        import os

        import torch

        ema_dir = str(tmp_path / "ema")
        params = {"w": np.ones((4, 4), np.float32)}
        for std, step in [(0.05, 4), (0.1, 4), (0.05, 8), (0.1, 8)]:
            ema_lib.save_snapshot(ema_dir, std, step, params)
            torch.save(
                {"std": std, "t": step, "state_dict": {}},
                os.path.join(ema_dir, f"{std:.3f}_{step:07d}.pt"),
            )
        snaps = ema_lib.list_snapshots(ema_dir)
        assert len(snaps) == 4
        assert all(p.endswith(".npz") for _, _, p in snaps)  # native preferred
        rec = ema_lib.calculate_posthoc_ema(0.07, ema_dir, verbose=False)
        assert np.isfinite(rec["w"]).all()


class TestLRSchedule:
    def test_matches_reference_lambda(self):
        """Reference lr_lambda semantics (`train.py:179-197`)."""
        warmup, start_decay = default_schedule_steps(15000)
        assert warmup == 100 and start_decay == 1500
        sched = warmup_flat_invsqrt(1e-2, warmup, start_decay)

        def ref(step):
            if step + 1 < warmup:
                return (step + 1) / warmup
            if step >= start_decay:
                return 1.0 / math.sqrt(max(step / start_decay, 1))
            return 1.0

        for step in [0, 1, 50, 98, 99, 100, 1000, 1499, 1500, 3000, 15000]:
            np.testing.assert_allclose(
                float(sched(step)), 1e-2 * ref(step), rtol=1e-6, err_msg=str(step)
            )


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = build_config("DiT-XS/8", in_channels=4, input_size=16, num_classes=10)
    diffusion = create_diffusion("")
    ds = SyntheticLatentDataset(num_examples=64, num_classes=10)
    sched = warmup_flat_invsqrt(1e-2, 5, 50)
    tx = create_optimizer(sched)
    step_fn = make_train_step(
        cfg,
        diffusion,
        tx,
        stats_mean=jnp.asarray(ds.stats["mean"]),
        stats_std=jnp.asarray(ds.stats["std"]),
    )
    state = create_train_state(cfg, tx, seed=0)
    return cfg, ds, jax.jit(step_fn, donate_argnums=0), state


class TestTrainStep:
    def test_smoke_loss_decreases(self, tiny_setup):
        """100-step smoke train on synthetic latents: loss must drop and
        weights stay normalized (SURVEY.md §4.6)."""
        cfg, ds, step_fn, state = tiny_setup
        it = ds.batches(batch_size=16, seed=0)
        losses = []
        for _ in range(100):
            state, metrics = step_fn(state, next(it))
            losses.append(float(metrics["loss"]))
        first, last = np.mean(losses[:10]), np.mean(losses[-10:])
        assert last < first, (first, last)
        assert np.isfinite(losses).all()
        # forced WN fixed point: stored rows on the norm manifold
        w = np.asarray(state.params["blocks_0"]["attn"]["qkv_proj"]["weight"])
        np.testing.assert_allclose(
            np.linalg.norm(w, axis=-1), math.sqrt(w.shape[-1]), rtol=1e-3
        )
        # EMA trees track but lag the params
        ema_w = np.asarray(state.ema[ema_key(0.05)]["blocks_0"]["attn"]["qkv_proj"]["weight"])
        assert not np.allclose(ema_w, w)
        assert np.isfinite(ema_w).all()
        assert int(state.step) == 100

    def test_loss_second_moment_sampler_training(self, tiny_setup):
        """--timestep-sampler loss-second-moment: importance-sampling state
        lives in TrainState and evolves inside the jitted step."""
        cfg, ds, _, _ = tiny_setup
        from mapdit_tpu.diffusion import create_diffusion

        diffusion = create_diffusion("")
        sched = warmup_flat_invsqrt(1e-2, 5, 50)
        tx = create_optimizer(sched)
        step_fn = jax.jit(
            make_train_step(
                cfg,
                diffusion,
                tx,
                stats_mean=jnp.asarray(ds.stats["mean"]),
                stats_std=jnp.asarray(ds.stats["std"]),
                timestep_sampler="loss-second-moment",
            ),
            donate_argnums=0,
        )
        state = create_train_state(
            cfg, tx, seed=2, timestep_sampler="loss-second-moment"
        )
        it = ds.batches(batch_size=8, seed=2)
        for _ in range(3):
            state, metrics = step_fn(state, next(it))
        assert np.isfinite(float(metrics["loss"]))
        # 3 steps x 8 samples folded into the loss history
        assert int(np.asarray(state.sampler_state.counts).sum()) == 24

    def test_checkpoint_roundtrip_and_resume(self, tiny_setup, tmp_path):
        from mapdit_tpu.training.checkpoint import (
            latest_checkpoint,
            restore_state,
            save_state,
        )

        cfg, ds, step_fn, _ = tiny_setup
        sched = warmup_flat_invsqrt(1e-2, 5, 50)
        tx = create_optimizer(sched)
        state = create_train_state(cfg, tx, seed=1)
        it = ds.batches(batch_size=8, seed=1)
        for _ in range(3):
            state, _ = step_fn(state, next(it))

        save_state(str(tmp_path), 3, state)
        path = latest_checkpoint(str(tmp_path))
        assert path and path.endswith("0000003.msgpack")

        template = create_train_state(cfg, tx, seed=99)
        restored = restore_state(path, template)
        assert int(restored.step) == 3
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )
        # restored state is steppable
        restored, metrics = step_fn(restored, next(it))
        assert np.isfinite(float(metrics["loss"]))

    def test_interrupted_save_is_invisible_to_resume(self, tiny_setup, tmp_path):
        """A process killed mid-write must never poison --resume: saves go
        through a .tmp rename, and a leftover partial .tmp (or a truncated
        real-looking file from a pre-atomic writer) is skipped/irrelevant."""
        import os

        from mapdit_tpu.training.checkpoint import latest_checkpoint, save_state
        from mapdit_tpu.training.ema import list_snapshots, save_snapshot

        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        state = create_train_state(cfg, tx, seed=1)

        good = save_state(str(tmp_path), 2, state)
        # simulate a kill mid-write of the NEXT checkpoint
        ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
        with open(os.path.join(ckpt_dir, "0000004.msgpack.tmp"), "wb") as f:
            f.write(b"\x00" * 128)
        assert latest_checkpoint(str(tmp_path)) == good
        # no stray tmp left behind by a completed save
        assert [f for f in os.listdir(ckpt_dir) if f.endswith(".tmp")] == [
            "0000004.msgpack.tmp"
        ]

        ema_dir = os.path.join(str(tmp_path), "ema")
        snap = save_snapshot(ema_dir, 0.05, 2, state.params)
        with open(os.path.join(ema_dir, "0.050_0000004.npz.tmp.npz"), "wb") as f:
            f.write(b"\x00" * 128)
        assert [p for _, _, p in list_snapshots(ema_dir)] == [snap]


class TestGradAccum:
    """--grad-accum: micro-batch scan with averaged gradients must trace the
    EXACT unaccumulated trajectory (per-row t/noise drawn for the full batch
    up front; mean of equal-size micro grads == full-batch grad)."""

    @staticmethod
    def _mk(grad_accum, dropout=0.0, sampler="uniform"):
        cfg = build_config(
            "DiT-XS/8", in_channels=4, input_size=16, num_classes=10,
            class_dropout_prob=dropout,
        )
        diffusion = create_diffusion("")
        ds = SyntheticLatentDataset(num_examples=64, num_classes=10)
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        step_fn = make_train_step(
            cfg, diffusion, tx,
            stats_mean=jnp.asarray(ds.stats["mean"]),
            stats_std=jnp.asarray(ds.stats["std"]),
            grad_accum=grad_accum,
            timestep_sampler=sampler,
        )
        state = create_train_state(
            cfg, tx, seed=0, timestep_sampler=sampler,
            num_timesteps=diffusion.num_timesteps,
        )
        return ds, jax.jit(step_fn), state

    def test_exact_equivalence(self):
        # class_dropout_prob=0 so the only per-micro RNG (the CFG label-drop
        # mask derivation) is immaterial; everything else matches bitwise-ish.
        ds, step1, state1 = self._mk(1)
        _, step4, state4 = self._mk(4)
        it1 = ds.batches(batch_size=16, seed=0)
        it4 = ds.batches(batch_size=16, seed=0)
        for _ in range(3):
            state1, m1 = step1(state1, next(it1))
            state4, m4 = step4(state4, next(it4))
            np.testing.assert_allclose(
                float(m1["loss"]), float(m4["loss"]), rtol=1e-5
            )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            state1.params,
            state4.params,
        )
        assert int(state4.step) == 3  # optimizer steps, not micro steps

    def test_with_dropout_and_ema(self):
        ds, step2, state = self._mk(2, dropout=0.1)
        it = ds.batches(batch_size=16, seed=0)
        for _ in range(4):
            state, metrics = step2(state, next(it))
            assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 4
        ema_w = np.asarray(
            state.ema[ema_key(0.05)]["blocks_0"]["attn"]["qkv_proj"]["weight"]
        )
        assert np.isfinite(ema_w).all()

    def test_composes_with_loss_second_moment_sampler(self):
        ds, step2, state = self._mk(2, sampler="loss-second-moment")
        it = ds.batches(batch_size=16, seed=0)
        for _ in range(3):
            state, metrics = step2(state, next(it))
            assert np.isfinite(float(metrics["loss"]))
        # per-sample losses from the micro scan must reach the resampler
        assert int(np.asarray(state.sampler_state.counts).sum()) == 48


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tiny_setup, tmp_path):
        from mapdit_tpu.training.checkpoint import (
            latest_checkpoint_any,
            restore_state,
            save_state_orbax,
        )

        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        state = create_train_state(cfg, tx, seed=4)
        it = ds.batches(batch_size=8, seed=4)
        state, _ = step_fn(state, next(it))

        path = save_state_orbax(str(tmp_path), 1, state)
        assert path.endswith("0000001.orbax")
        assert latest_checkpoint_any(str(tmp_path)) == path

        template = create_train_state(cfg, tx, seed=9)
        restored = restore_state(path, template)
        assert int(restored.step) == 1
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )

    def test_async_saver_overlapped_saves(self, tiny_setup, tmp_path):
        """AsyncOrbaxSaver: save() must not block training — the state is
        host-snapshotted on return, so donating/advancing it while the
        background write runs is safe; close() joins the last write."""
        from mapdit_tpu.training.checkpoint import (
            AsyncOrbaxSaver,
            latest_checkpoint_any,
            restore_state,
        )

        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        state = create_train_state(cfg, tx, seed=5)
        it = ds.batches(batch_size=8, seed=5)

        saver = AsyncOrbaxSaver()
        saved_params = None
        for step in (1, 2):
            state, _ = step_fn(state, next(it))
            saver.save(str(tmp_path), step, state)
            # mutate immediately: donated buffers are reused by the next step
            saved_params = jax.device_get(state.params)
        state, _ = step_fn(state, next(it))
        saver.close()

        path = latest_checkpoint_any(str(tmp_path))
        assert path.endswith("0000002.orbax")
        template = create_train_state(cfg, tx, seed=9)
        restored = restore_state(path, template)
        assert int(restored.step) == 2
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            saved_params,
            restored.params,
        )


class TestAsyncMsgpackSaver:
    def test_nonblocking_save_snapshots_at_save_time(self, tiny_setup, tmp_path):
        """AsyncMsgpackSaver (VERDICT r04 #3): save() snapshots on device and
        returns before the file write; donating/advancing the live state
        while the background fetch+write runs must not corrupt the
        checkpoint — the restored params equal the state AT SAVE TIME."""
        from mapdit_tpu.training.checkpoint import (
            AsyncMsgpackSaver,
            latest_checkpoint,
            restore_state,
        )

        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        state = create_train_state(cfg, tx, seed=7)
        it = ds.batches(batch_size=8, seed=7)

        saver = AsyncMsgpackSaver()
        state, _ = step_fn(state, next(it))
        at_save = jax.device_get(state.params)
        path = saver.save(str(tmp_path), 1, state)
        # advance twice immediately: donated buffers are reused while the
        # background thread is still fetching the snapshot
        for _ in range(2):
            state, _ = step_fn(state, next(it))
        saver.close()

        assert latest_checkpoint(str(tmp_path)) == path
        template = create_train_state(cfg, tx, seed=9)
        restored = restore_state(path, template)
        assert int(restored.step) == 1
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            at_save,
            restored.params,
        )
        # the advanced live state diverged from the snapshot (donation-safe)
        assert not np.allclose(
            np.asarray(jax.tree_util.tree_leaves(at_save)[0]),
            np.asarray(jax.tree_util.tree_leaves(jax.device_get(state.params))[0]),
        )

    def test_write_error_surfaces_on_next_wait(self, tiny_setup, tmp_path):
        from mapdit_tpu.training.checkpoint import AsyncMsgpackSaver

        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))
        state = create_train_state(cfg, tx, seed=3)

        saver = AsyncMsgpackSaver()
        # point the write at an unwritable location
        blocked = tmp_path / "blocked"
        blocked.write_text("not a dir")
        saver.save(str(blocked / "sub"), 1, state)
        with pytest.raises(Exception):
            saver.wait()
        # saver is reusable after the error surfaced
        saver.save(str(tmp_path), 2, state)
        saver.close()


class TestDevicePrefetcher:
    def test_order_preserved_and_exhaustion(self):
        from mapdit_tpu.training.device_prefetch import DevicePrefetcher

        batches = ({"x": np.full((2,), i)} for i in range(6))
        staged = DevicePrefetcher(batches, lambda b: {"x": b["x"] + 100})
        seen = [int(b["x"][0]) for b in staged]
        assert seen == [100 + i for i in range(6)]
        with pytest.raises(StopIteration):
            next(staged)

    def test_stage_error_propagates(self):
        from mapdit_tpu.training.device_prefetch import DevicePrefetcher

        def bad_stage(b):
            raise RuntimeError("stage boom")

        staged = DevicePrefetcher(iter([{"x": 1}]), bad_stage)
        with pytest.raises(RuntimeError, match="stage boom"):
            next(staged)

    def test_close_unblocks_producer(self):
        from mapdit_tpu.training.device_prefetch import DevicePrefetcher

        batches = ({"x": i} for i in range(1000))
        staged = DevicePrefetcher(batches, lambda b: b, depth=1)
        assert next(staged)["x"] == 0
        staged.close()  # producer blocked on the full queue must exit
        staged._t.join(timeout=5)
        assert not staged._t.is_alive()


class TestDeterminism:
    def test_same_seed_identical_trajectory(self, tiny_setup):
        """Bitwise training determinism: two runs from the same seed produce
        identical parameters after several steps (explicit PRNG threading —
        the reference cannot make this guarantee with DataLoader workers)."""
        cfg, ds, step_fn, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50))

        def run():
            state = create_train_state(cfg, tx, seed=11)
            it = ds.batches(batch_size=8, seed=11)
            for _ in range(4):
                state, m = step_fn(state, next(it))
            return state.params, float(m["loss"])

        p1, l1 = run()
        p2, l2 = run()
        assert l1 == l2
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p1,
            p2,
        )

    def test_grad_clip_optimizer(self, tiny_setup):
        cfg, ds, _, _ = tiny_setup
        tx = create_optimizer(warmup_flat_invsqrt(1e-2, 5, 50), grad_clip=0.001)
        step_fn = make_train_step(
            cfg, __import__("mapdit_tpu.diffusion", fromlist=["create_diffusion"]).create_diffusion(""),
            tx,
            stats_mean=jnp.asarray(ds.stats["mean"]),
            stats_std=jnp.asarray(ds.stats["std"]),
        )
        state = create_train_state(cfg, tx, seed=12)
        state, m = jax.jit(step_fn, donate_argnums=0)(state, next(ds.batches(8, seed=12)))
        assert np.isfinite(float(m["loss"]))
