"""Import reference (PyTorch) state dicts into mapdit-tpu variables.

Maps the reference DiT's state_dict naming (`src/dit.py`, `src/blocks/*`)
onto this package's flax variable tree. Weight layouts are identical by
construction — every MP weight is stored ``(out_dim, in_dim)`` — so the
mapping is pure renaming. Accepts dicts of numpy arrays (e.g. loaded from a
``torch.save``d checkpoint converted with ``{k: v.numpy()}``), including
torch.compile's ``_orig_mod.`` key mangling (SURVEY.md §2.8 interop quirk).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _set(tree: dict, path: list, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(np.asarray(value))


_RENAMES = [
    # (regex on torch key, flax path template; groups substituted)
    (r"^x_embedder\.weight$", "params/x_embedder/weight"),
    (r"^t_embedder\.mlp\.net\.0\.weight$", "params/t_embedder/mlp/fc1/weight"),
    (r"^t_embedder\.mlp\.net\.2\.weight$", "params/t_embedder/mlp/fc2/weight"),
    (r"^t_embedder\.embedding\.scale$", "constants/t_embedder/fourier/scale"),
    (r"^t_embedder\.embedding\.shift$", "constants/t_embedder/fourier/shift"),
    (r"^y_embedder\.embedding\.weight$", "params/y_embedder/embedding/weight"),
    (r"^blocks\.(\d+)\.attn\.qkv_proj\.weight$", "params/blocks_{0}/attn/qkv_proj/weight"),
    (r"^blocks\.(\d+)\.attn\.out_proj\.weight$", "params/blocks_{0}/attn/out_proj/weight"),
    (r"^blocks\.(\d+)\.mlp\.net\.0\.weight$", "params/blocks_{0}/mlp/fc1/weight"),
    (r"^blocks\.(\d+)\.mlp\.net\.2\.weight$", "params/blocks_{0}/mlp/fc2/weight"),
    (r"^blocks\.(\d+)\.modulation\.1\.weight$", "params/blocks_{0}/modulation/linear/weight"),
    (r"^blocks\.(\d+)\.gain_msa$", "params/blocks_{0}/gain_msa"),
    (r"^blocks\.(\d+)\.gain_mlp$", "params/blocks_{0}/gain_mlp"),
    (r"^final_layer\.linear\.weight$", "params/final_layer/linear/weight"),
    (r"^final_layer\.modulation\.1\.weight$", "params/final_layer/modulation/linear/weight"),
    (r"^final_layer\.gain_mod$", "params/final_layer/gain_mod"),
    (r"^final_layer\.mean_scale\.linear\.weight$", "params/final_layer/mean_scale/linear/weight"),
    (r"^final_layer\.mean_scale\.reference$", "params/final_layer/mean_scale/reference"),
    (r"^final_layer\.sigma_scale\.linear\.weight$", "params/final_layer/sigma_scale/linear/weight"),
    (r"^final_layer\.sigma_scale\.reference$", "params/final_layer/sigma_scale/reference"),
    # pos_embed is deterministic and recomputed at trace time; skip it.
    (r"^pos_embed$", None),
]


def variables_from_torch_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference state_dict (arrays) to flax variables
    {'params': ..., 'constants': ...}."""
    out: Dict = {}
    unmatched = []
    for key, value in state_dict.items():
        key = key.removeprefix("_orig_mod.")
        for pattern, template in _RENAMES:
            m = re.match(pattern, key)
            if m:
                if template is not None:
                    path = template.format(*m.groups()).split("/")
                    _set(out, path, value)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise KeyError(f"unmatched reference keys: {unmatched[:10]}")
    return out


def state_dict_from_variables(variables: Mapping, cfg=None) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> reference-named state dict
    (numpy arrays). Lets runs trained here be sampled by the reference
    (`torch.save({'model': {k: torch.tensor(v) for k, v in sd.items()}})`).
    Weight layouts are identical, so this is pure renaming; the
    deterministic pos_embed buffer is regenerated to complete the
    reference's expected key set."""
    out: Dict[str, np.ndarray] = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                emit(prefix + [k], v)
            else:
                out["/".join(prefix + [k])] = np.asarray(v)

    emit(["params"], variables["params"])
    emit(["constants"], variables.get("constants", {}))

    sd: Dict[str, np.ndarray] = {}
    if cfg is not None:
        # the reference's state_dict includes the pos_embed buffer
        # (src/dit.py:46-48): regenerate it so strict load_state_dict passes
        from mapdit_tpu.ops.mp import normalize
        from mapdit_tpu.ops.pos_embed import get_2d_sincos_pos_embed

        table = get_2d_sincos_pos_embed(cfg.hidden_size, cfg.input_size // cfg.patch_size)
        out["__pos_embed__"] = np.asarray(
            normalize(jnp.asarray(table, jnp.float32))[None]
        )

    for flat, val in out.items():
        if flat == "__pos_embed__":
            sd["pos_embed"] = val
            continue
        for pattern, template in _RENAMES:
            if template is None:
                continue
            # invert: template has {0} for the block index
            if "{0}" in template:
                m = re.match(template.replace("{0}", r"(\d+)").replace("/", "/"), flat)
                if m:
                    torch_key = _unrename(pattern, m.group(1))
                    sd[torch_key] = val
                    break
            elif template == flat:
                sd[_unrename(pattern, None)] = val
                break
    return sd


def _unrename(pattern: str, idx) -> str:
    key = pattern.strip("^$").replace("\\.", ".")
    if idx is not None:
        key = key.replace("(\\d+)", idx)
    return key
