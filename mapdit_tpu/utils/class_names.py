"""ImageNet-1k class-name pretty printing.

The reference vendors the full 1000-entry class-name dict inline
(`utils.py:37-1037`, used only for print statements in sample scripts).
Here the same mapping ships as package *data* (imagenet_classes.json,
extracted from the reference table the way the golden fixtures are), so
offline runs print real names like the reference does; an HF dataset cache
is the fallback source, then the bare index.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

_JSON_PATH = os.path.join(os.path.dirname(__file__), "imagenet_classes.json")


@functools.lru_cache(maxsize=1)
def _mapping() -> Optional[Dict[int, str]]:
    if os.path.exists(_JSON_PATH):
        with open(_JSON_PATH) as f:
            return {int(k): v for k, v in json.load(f).items()}
    # HF datasets caches ImageNet label metadata with the dataset itself.
    # Offline-first: never hit the network for a print statement.
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
