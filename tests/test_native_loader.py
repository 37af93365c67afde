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
