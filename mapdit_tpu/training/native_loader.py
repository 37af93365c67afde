"""ctypes binding for the native (C++) latent-batch prefetcher.

The framework's host-side IO tier: `native/latent_loader.cc` mmaps the .npy
posterior arrays and gathers shuffled batches on background threads so the
training loop's dispatch never blocks on IO (the reference used torch
DataLoader worker *subprocesses* for this role, `train.py:31`). Build with
``tools/build_native.sh``; `NativeLatentLoader.available()` gates usage and
`LatentDataset` remains the pure-Python fallback with identical batch
semantics (epoch shuffle, drop_last).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Iterator

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "liblatent_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ll_open.restype = ctypes.c_void_p
        lib.ll_open.argtypes = [ctypes.c_char_p] + [ctypes.c_uint64] * 7
        lib.ll_next.restype = ctypes.c_int
        lib.ll_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
        lib.ll_feature_size.restype = ctypes.c_uint64
        lib.ll_feature_size.argtypes = [ctypes.c_void_p]
        lib.ll_num_examples.restype = ctypes.c_uint64
        lib.ll_num_examples.argtypes = [ctypes.c_void_p]
        lib.ll_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeLatentLoader:
    """Prefetching batch stream over a .npy latent dataset directory."""

    @staticmethod
    def available(data_path: str) -> bool:
        if os.environ.get("MAPDIT_NO_NATIVE_LOADER") == "1":
            # A/B escape hatch: force the Python fallback loader so the
            # host-stall contribution of each path can be measured on the
            # same dataset (BENCH_NOTES loader attribution).
            return False
        return (
            _load_lib() is not None
            and os.path.exists(os.path.join(data_path, "posterior_means.npy"))
        )

    def __init__(
        self,
        data_path: str,
        batch_size: int,
        seed: int = 0,
        queue_depth: int = 4,
        num_threads: int = 2,
        shape=None,
        process_index: int = 0,
        process_count: int = 1,
        start_step: int = 0,
    ):
        """``batch_size`` is the GLOBAL batch; each loader instance yields the
        disjoint ``batch_size // process_count`` rows its process owns (shared
        permutation seed across processes — see `data.batch_index_stream`).
        ``start_step`` fast-forwards the shuffle stream for data-cursor
        resume."""
        lib = _load_lib()
        assert lib is not None, "native loader not built (tools/build_native.sh)"
        self._lib = lib
        self._handle = lib.ll_open(
            data_path.encode(), batch_size, seed, queue_depth, num_threads,
            process_index, process_count, start_step,
        )
        if not self._handle:
            raise RuntimeError(f"ll_open failed for {data_path}")
        self.batch_size = batch_size // process_count  # local rows per yield
        self.feat = int(lib.ll_feature_size(self._handle))
        self.num_examples = int(lib.ll_num_examples(self._handle))
        if shape is None:
            # infer (C, H, W) from the npy on disk
            arr = np.load(os.path.join(data_path, "posterior_means.npy"), mmap_mode="r")
            shape = arr.shape[1:]
        self.row_shape = tuple(shape)

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        b, feat = self.batch_size, self.feat
        while True:
            mean = np.empty((b, feat), np.float32)
            std = np.empty((b, feat), np.float32)
            labels = np.empty((b,), np.int32)
            rc = self._lib.ll_next(
                self._handle,
                mean.ctypes.data_as(ctypes.c_void_p),
                std.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p),
            )
            if rc != 0:
                return
            yield {
                "mean": mean.reshape(b, *self.row_shape),
                "std": std.reshape(b, *self.row_shape),
                "y": labels,
            }

    def close(self):
        if self._handle:
            self._lib.ll_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
