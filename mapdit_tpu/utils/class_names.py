"""ImageNet-1k class-name pretty printing.

The reference vendors the full 1000-entry class-name dict inline
(`utils.py:37-1037`, used only for print statements in sample scripts).
Rather than vendor a thousand lines of label data, resolve names at runtime
from whatever metadata source is available offline, falling back to the
bare index.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional


@functools.lru_cache(maxsize=1)
def _mapping() -> Optional[Dict[int, str]]:
    # HF datasets caches ImageNet label metadata with the dataset itself.
    # Offline-first: never hit the network for a print statement.
    import os

    os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    try:
        from datasets import load_dataset_builder

        b = load_dataset_builder("benjamin-paine/imagenet-1k-128x128")
        names = b.info.features["label"].names
        return dict(enumerate(names))
    except Exception:
        return None


def class_name(idx: int) -> str:
    m = _mapping()
    if m and idx in m:
        return m[idx]
    return f"class {idx}"
