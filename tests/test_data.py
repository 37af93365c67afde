"""Host data-pipeline tests: the multi-host batch-partition contract
(disjoint per-process slices with exact global coverage — the
distributed-sampler pattern, SURVEY.md §2.7 per-host loading) and the
data-cursor resume fast-forward.

`--batch-size` is GLOBAL: every process draws the same epoch permutation
and owns rows [p*local : (p+1)*local] of each global batch, so assembling
the slices with `jax.make_array_from_process_local_data` reconstructs one
exact global batch per step (no duplicated rows across hosts)."""

import numpy as np

from mapdit_tpu.training.data import (
    SyntheticLatentDataset,
    batch_index_stream,
)


class TestBatchIndexStream:
    def test_single_process_epoch_semantics(self):
        """batch 8 over 50 rows: 6 batches/epoch, no row repeats in-epoch."""
        s = batch_index_stream(50, 8, seed=0)
        flat = np.concatenate([next(s) for _ in range(6)])
        assert len(flat) == 48 and len(set(flat.tolist())) == 48

    def test_disjoint_and_covering(self):
        """4 processes x global batch 16: per-step slices are pairwise
        disjoint and their union is exactly the single-process global batch."""
        n, B, P = 64, 16, 4
        streams = [
            batch_index_stream(n, B, seed=7, process_index=p, process_count=P)
            for p in range(P)
        ]
        ref = batch_index_stream(n, B, seed=7)
        for _ in range(12):  # 3 epochs
            slices = [next(s) for s in streams]
            assert all(len(sl) == B // P for sl in slices)
            union = np.concatenate(slices)
            assert len(set(union.tolist())) == B  # pairwise disjoint
            np.testing.assert_array_equal(np.sort(union), np.sort(next(ref)))

    def test_start_step_fast_forward(self):
        """Resume continues the exact shuffle stream — mid-epoch (k=3) and
        across an epoch boundary (k=9; 6 steps/epoch)."""
        for k in (3, 9):
            fresh = batch_index_stream(50, 8, seed=1)
            for _ in range(k):
                next(fresh)
            resumed = batch_index_stream(50, 8, seed=1, start_step=k)
            for _ in range(8):
                np.testing.assert_array_equal(next(fresh), next(resumed))

    def test_start_step_with_processes(self):
        k = 5
        kw = dict(seed=2, process_index=1, process_count=2)
        fresh = batch_index_stream(64, 16, **kw)
        for _ in range(k):
            next(fresh)
        resumed = batch_index_stream(64, 16, start_step=k, **kw)
        for _ in range(6):
            np.testing.assert_array_equal(next(fresh), next(resumed))


class TestDatasetBatchesMultiProcess:
    def test_assembled_global_batch_matches(self):
        """Concatenating the per-process LatentDataset slices yields the same
        multiset of (mean, std, label) rows as the single-process stream —
        the property a multi-host run needs for correct global batches."""
        ds = SyntheticLatentDataset(num_examples=48, num_classes=5, seed=4)
        P, B = 2, 12
        parts = [
            ds.batches(batch_size=B, seed=11, process_index=p, process_count=P)
            for p in range(P)
        ]
        ref = ds.batches(batch_size=B, seed=11)
        rows = lambda a: sorted(a[i].tobytes() for i in range(a.shape[0]))
        for _ in range(8):  # 2 epochs
            local = [next(it) for it in parts]
            g = next(ref)
            for k in ("mean", "std"):
                assert rows(np.concatenate([p[k] for p in local])) == rows(g[k])
            np.testing.assert_array_equal(
                np.sort(np.concatenate([p["y"] for p in local])), np.sort(g["y"])
            )

    def test_dataset_resume_cursor(self):
        """LatentDataset.batches(start_step=k) equals consuming k batches."""
        ds = SyntheticLatentDataset(num_examples=40, num_classes=3, seed=6)
        fresh = ds.batches(batch_size=8, seed=5)
        for _ in range(7):
            next(fresh)
        resumed = ds.batches(batch_size=8, seed=5, start_step=7)
        for _ in range(4):
            a, b = next(fresh), next(resumed)
            for k in ("mean", "std", "y"):
                np.testing.assert_array_equal(a[k], b[k])
