"""Latent dataset pipeline.

The reference stores the SD-VAE *posterior* (means/stds) and samples a fresh
latent per example per epoch in DataLoader worker subprocesses
(`download_data.py:34-66`, `train.py:144-176`). Here the host side only
shuffles indices and gathers raw (mean, std, label) slices from memory-mapped
arrays; the stochastic posterior draw and normalization happen inside the
jitted train step on device (`mapdit_tpu.training.state.make_train_step`),
so the worker-process boundary disappears.

Artifact formats:
  * native:   posterior_means.npy / posterior_stds.npy / labels.npy (memmap)
              + stats.npz {mean, std}
  * reference: posterior_means.pt / ... / stats.pt (torch CPU load, for
              drop-in reuse of datasets built by the reference's
              download_data.py)
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import numpy as np


def _load_array(data_path: str, stem: str):
    npy = os.path.join(data_path, f"{stem}.npy")
    if os.path.exists(npy):
        return np.load(npy, mmap_mode="r")
    pt = os.path.join(data_path, f"{stem}.pt")
    if os.path.exists(pt):
        import torch

        return torch.load(pt, map_location="cpu", weights_only=True).numpy()
    raise FileNotFoundError(f"{stem}.npy / {stem}.pt not found in {data_path}")


def _load_stats(data_path: str) -> Dict[str, np.ndarray]:
    npz = os.path.join(data_path, "stats.npz")
    if os.path.exists(npz):
        with np.load(npz) as f:
            return {"mean": f["mean"], "std": f["std"]}
    pt = os.path.join(data_path, "stats.pt")
    if os.path.exists(pt):
        import torch

        d = torch.load(pt, map_location="cpu", weights_only=True)
        return {"mean": d["mean"].numpy(), "std": d["std"].numpy()}
    raise FileNotFoundError(f"stats.npz / stats.pt not found in {data_path}")


class LatentDataset:
    """VAE-posterior latent dataset (reference `CustomDataset`, train.py:144-176)."""

    def __init__(self, data_path: str):
        self.means = _load_array(data_path, "posterior_means")
        self.stds = _load_array(data_path, "posterior_stds")
        self.labels = np.asarray(_load_array(data_path, "labels"))
        self.stats = _load_stats(data_path)
        assert self.means.shape[0] == self.stds.shape[0] == self.labels.shape[0]

    @property
    def data_size(self) -> int:
        return self.means.shape[2]

    @property
    def channels(self) -> int:
        return self.means.shape[1]

    def __len__(self) -> int:
        return self.means.shape[0]

    def batches(
        self, batch_size: int, seed: int = 0, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite epoch-shuffled batch stream of posterior params.

        Gather is a contiguous fancy-index on the memmap — cheap at latent
        sizes (batch 256 x 4x16x16 f32 = 1 MiB/step).
        """
        rng = np.random.default_rng(seed)
        n = len(self)
        while True:
            perm = rng.permutation(n)
            end = n - (n % batch_size) if drop_last else n
            for i in range(0, end, batch_size):
                idx = np.sort(perm[i : i + batch_size])
                yield {
                    "mean": np.ascontiguousarray(self.means[idx], dtype=np.float32),
                    "std": np.ascontiguousarray(self.stds[idx], dtype=np.float32),
                    "y": self.labels[idx].astype(np.int32),
                }


class SyntheticLatentDataset(LatentDataset):
    """Synthetic class-structured posterior dataset for tests/benchmarks
    (stands in for the HF ImageNet-128 latents offline)."""

    def __init__(
        self,
        num_examples: int = 1024,
        channels: int = 4,
        size: int = 16,
        num_classes: int = 10,
        seed: int = 0,
    ):
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, num_classes, num_examples).astype(np.int64)
        centers = rng.normal(size=(num_classes, channels, 1, 1)).astype(np.float32)
        self.means = (
            centers[self.labels]
            + 0.3 * rng.normal(size=(num_examples, channels, size, size))
        ).astype(np.float32)
        self.stds = (
            0.1 + 0.05 * rng.random((num_examples, channels, size, size))
        ).astype(np.float32)
        mean = self.means.mean(axis=(0, 2, 3))
        var = (self.stds**2).mean(axis=(0, 2, 3)) + (
            (self.means - mean[None, :, None, None]) ** 2
        ).mean(axis=(0, 2, 3))
        self.stats = {"mean": mean, "std": np.sqrt(var)}


def save_dataset(
    out_dir: str,
    means: np.ndarray,
    stds: np.ndarray,
    labels: np.ndarray,
    stats: Dict[str, np.ndarray],
) -> None:
    """Write the native artifact family (memmap-friendly .npy + stats.npz)."""
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "posterior_means.npy"), means)
    np.save(os.path.join(out_dir, "posterior_stds.npy"), stds)
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    np.savez(os.path.join(out_dir, "stats.npz"), mean=stats["mean"], std=stats["std"])
