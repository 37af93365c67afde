"""Experiment directory + config.yaml round-trip.

Layout parity with the reference (`train.py:200-214`, SURVEY.md §1):
``<results>/<NNN>-<model-name>/{config.yaml, log.txt, checkpoints/, ema/,
fid_samples/}``. The train-time config (argparse Namespace + dataset-derived
in_channels/input_size/stats) is YAML-dumped and is the model-construction
source of truth for every sampling script (`train.py:34-40` <->
`utils.py:9-17`).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import yaml

from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.models.registry import build_config

# Config keys consumed by model construction; everything else in the YAML is
# training/runtime metadata.
_MODEL_KEYS = (
    "in_channels",
    "input_size",
    "num_classes",
    "mlp_ratio",
    "class_dropout_prob",
    "learn_sigma",
    "use_cosine_attention",
    "use_weight_normalization",
    "use_forced_weight_normalization",
    "use_mp_residual",
    "use_mp_silu",
    "use_no_layernorm",
    "use_mp_pos_enc",
    "use_mp_embedding",
    "modulation",
    "compute_dtype",
    "attention_impl",
    "block_kernel",
    "attn_bwd",
    "remat",
    "scan_blocks",
)


def setup_experiment(model_name: str, results_dir: str) -> str:
    os.makedirs(results_dir, exist_ok=True)
    index = len(glob.glob(os.path.join(results_dir, "*")))
    exp_dir = os.path.join(results_dir, f"{index:03d}-{model_name.replace('/', '-')}")
    os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
    return exp_dir


def save_config(exp_dir: str, args: Dict[str, Any]) -> None:
    with open(os.path.join(exp_dir, "config.yaml"), "w") as f:
        yaml.dump(args, f)


def load_config(exp_dir: str) -> Dict[str, Any]:
    with open(os.path.join(exp_dir, "config.yaml")) as f:
        return yaml.safe_load(f)


def config_from_args(args: Dict[str, Any]) -> DiTConfig:
    """Rebuild the DiTConfig a training run used from its config.yaml dict
    (the reference's `get_model`, `utils.py:9-17`, extended with the
    `--use-*` flag family)."""
    overrides = {k: args[k] for k in _MODEL_KEYS if k in args}
    return build_config(args["model"], **overrides)


def percentile_arg(s: str):
    """argparse type for (0, 1] quantile flags (--dynamic-threshold): rejects
    out-of-range values at parse time instead of tripping an assert (or, under
    python -O, silently producing NaN latents) inside the chain builders."""
    import argparse

    v = float(s)
    if not 0.0 < v <= 1.0:
        raise argparse.ArgumentTypeError(f"{s!r}: must be in (0, 1]")
    return v
