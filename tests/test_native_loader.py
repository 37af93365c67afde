"""Native (C++) latent-loader tests: batch semantics match the Python
pipeline (epoch shuffle, drop_last, dtype/shape contract)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from mapdit_tpu.training.data import SyntheticLatentDataset, save_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "mapdit_tpu", "native", "liblatent_loader.so")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not os.path.exists(LIB):
        subprocess.run([os.path.join(REPO, "tools", "build_native.sh")], check=True)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("latents"))
    ds = SyntheticLatentDataset(num_examples=50, num_classes=7, seed=3)
    save_dataset(d, ds.means, ds.stds, ds.labels, ds.stats)
    return d, ds


class TestNativeLoader:
    def test_available_and_shapes(self, dataset_dir):
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        assert NativeLatentLoader.available(d)
        loader = NativeLatentLoader(d, batch_size=8, seed=0, num_threads=2)
        assert loader.num_examples == 50
        it = loader.batches()
        b = next(it)
        assert b["mean"].shape == (8, 4, 16, 16) and b["mean"].dtype == np.float32
        assert b["std"].shape == (8, 4, 16, 16)
        assert b["y"].shape == (8,) and b["y"].dtype == np.int32
        loader.close()

    def test_rows_are_real_dataset_rows(self, dataset_dir):
        """Every gathered (mean, std, label) triple must be an actual dataset
        row — catches indexing/stride bugs in the C++ gather."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        loader = NativeLatentLoader(d, batch_size=10, seed=1, num_threads=1)
        it = loader.batches()
        lookup = {ds.means[i].tobytes(): i for i in range(len(ds))}
        seen = set()
        for _ in range(10):  # 2 epochs of 5 batches (50/10)
            b = next(it)
            for r in range(10):
                i = lookup.get(b["mean"][r].tobytes())
                assert i is not None, "gathered row not in dataset"
                np.testing.assert_array_equal(b["std"][r], ds.stds[i])
                assert b["y"][r] == ds.labels[i]
                seen.add(i)
        # epoch shuffle without replacement: after 2 epochs every row seen
        assert seen == set(range(50))
        loader.close()

    def test_epoch_coverage_drop_last(self, dataset_dir):
        """batch 8 over 50 rows: 6 batches/epoch (48 rows), 2 dropped —
        each epoch visits each selected row at most once."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        loader = NativeLatentLoader(d, batch_size=8, seed=2, num_threads=1)
        it = loader.batches()
        lookup = {ds.means[i].tobytes(): i for i in range(len(ds))}
        epoch_rows = []
        for _ in range(6):
            b = next(it)
            epoch_rows.extend(lookup[b["mean"][r].tobytes()] for r in range(8))
        assert len(epoch_rows) == len(set(epoch_rows)) == 48
        loader.close()


class TestMultiProcessPartition:
    def test_disjoint_slices_cover_global_batch(self, dataset_dir):
        """Two loader instances with the same seed and process_index 0/1 must
        together yield exactly the rows a single-process loader yields per
        step (shared permutation, disjoint slices) — the multi-host feeding
        contract."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        mk = lambda p, pc: NativeLatentLoader(
            d, batch_size=10, seed=21, num_threads=1,
            process_index=p, process_count=pc,
        )
        p0, p1, ref = mk(0, 2), mk(1, 2), mk(0, 1)
        its = [ld.batches() for ld in (p0, p1, ref)]
        rows = lambda a: sorted(a[i].tobytes() for i in range(a.shape[0]))
        for _ in range(10):  # 2 epochs of 5 batches
            b0, b1, g = (next(it) for it in its)
            assert b0["mean"].shape[0] == b1["mean"].shape[0] == 5
            got = np.concatenate([b0["mean"], b1["mean"]])
            assert rows(got) == rows(g["mean"])
            assert len(set(rows(got))) == 10  # disjoint
        for ld in (p0, p1, ref):
            ld.close()

    def test_start_step_fast_forward(self, dataset_dir):
        """start_step=k reproduces the stream after consuming k batches —
        mid-epoch and across the epoch boundary (5 steps/epoch at batch 10)."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        for k in (2, 7):
            fresh = NativeLatentLoader(d, batch_size=10, seed=31, num_threads=1)
            it = fresh.batches()
            for _ in range(k):
                next(it)
            resumed = NativeLatentLoader(
                d, batch_size=10, seed=31, num_threads=1, start_step=k
            )
            rit = resumed.batches()
            for _ in range(4):
                a, b = next(it), next(rit)
                for key in ("mean", "std", "y"):
                    np.testing.assert_array_equal(a[key], b[key])
            fresh.close()
            resumed.close()


class TestThreadStress:
    def test_many_threads_consistent(self, dataset_dir):
        """4 prefetch threads x deep queue: every yielded row must still be a
        real dataset row (no torn reads under concurrency)."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        loader = NativeLatentLoader(d, batch_size=5, seed=9, num_threads=4, queue_depth=8)
        it = loader.batches()
        lookup = {ds.means[i].tobytes(): i for i in range(len(ds))}
        for _ in range(40):
            b = next(it)
            for r in range(5):
                i = lookup.get(b["mean"][r].tobytes())
                assert i is not None
                assert b["y"][r] == ds.labels[i]
        loader.close()


class TestOrderDeterminism:
    def test_multithreaded_order_matches_single_thread(self, dataset_dir):
        """Prefetch threads race their gathers, but the reorder buffer must
        emit batches in exact permutation order — the multi-host
        slice-alignment contract and start_step resume depend on it."""
        from mapdit_tpu.training.native_loader import NativeLatentLoader

        d, ds = dataset_dir
        one = NativeLatentLoader(d, batch_size=5, seed=13, num_threads=1)
        many = NativeLatentLoader(d, batch_size=5, seed=13, num_threads=4,
                                  queue_depth=6)
        it1, itn = one.batches(), many.batches()
        for _ in range(30):  # 3 epochs
            a, b = next(it1), next(itn)
            for key in ("mean", "std", "y"):
                np.testing.assert_array_equal(a[key], b[key])
        one.close()
        many.close()
