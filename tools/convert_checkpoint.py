"""Convert checkpoints between this framework and the reference (torch).

Import (theirs -> ours):
    python tools/convert_checkpoint.py import --torch ckpt.pt \
        --out variables.msgpack
Export (ours -> theirs), needs the run's config for the pos_embed buffer:
    python tools/convert_checkpoint.py export --state checkpoints/0001000.msgpack \
        --result-dir results/000-DiT-S-2 --out ckpt.pt

Weight layouts are identical by construction (`(out, in)` matrices named
`weight`), so conversion is pure renaming; see
mapdit_tpu/utils/torch_import.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def do_import(args):
    import torch
    from flax import serialization

    from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

    blob = torch.load(args.torch, map_location="cpu", weights_only=True)
    sd = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    if "state_dict" in sd:  # EMA snapshot container
        sd = sd["state_dict"]
    variables = variables_from_torch_state_dict({k: v.numpy() for k, v in sd.items()})
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"wrote {args.out}")


def do_export(args):
    import torch
    from flax import serialization

    from mapdit_tpu.utils.experiment import config_from_args, load_config
    from mapdit_tpu.utils.torch_import import state_dict_from_variables

    with open(args.state, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if "params" in state:
        variables = {"params": state["params"], "constants": state.get("constants", {})}
    else:
        variables = state
    cfg = config_from_args(load_config(args.result_dir)) if args.result_dir else None
    sd = state_dict_from_variables(variables, cfg=cfg)
    torch.save({"model": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


def do_export_ema(args):
    """Convert an experiment dir's .npz EMA ledger to the reference's
    ema/<std>_<step>.pt format (`src/ema.py:142-155`: fp16 state_dicts with
    the torch.compile `_orig_mod.` prefix), so a run trained here is
    post-hoc-reconstructable by the reference's own calculate_posthoc_ema."""
    import torch
    from flax import serialization

    from mapdit_tpu.training.ema import list_snapshots, load_snapshot
    from mapdit_tpu.utils.experiment import config_from_args, load_config
    from mapdit_tpu.utils.torch_import import state_dict_from_variables

    with open(os.path.join(args.result_dir, "constants.msgpack"), "rb") as f:
        constants = serialization.msgpack_restore(f.read())
    cfg = config_from_args(load_config(args.result_dir))
    os.makedirs(args.out, exist_ok=True)
    count = 0
    for std, step, path in list_snapshots(os.path.join(args.result_dir, "ema")):
        if not path.endswith(".npz"):
            continue
        sd = state_dict_from_variables(
            {"params": load_snapshot(path), "constants": constants}, cfg=cfg
        )
        sd_t = {
            "_orig_mod." + k: torch.tensor(np.asarray(v, np.float32)).half()
            for k, v in sd.items()
        }
        torch.save(
            {"std": std, "t": step, "state_dict": sd_t},
            os.path.join(args.out, f"{std:.3f}_{step:07d}.pt"),
        )
        count += 1
    print(f"wrote {count} reference EMA snapshots to {args.out}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("import")
    pi.add_argument("--torch", required=True, help="reference .pt (checkpoint or EMA snapshot)")
    pi.add_argument("--out", required=True, help="output flax variables .msgpack")
    pe = sub.add_parser("export")
    pe.add_argument("--state", required=True, help="our checkpoint .msgpack")
    pe.add_argument("--result-dir", default=None, help="experiment dir (for the pos_embed buffer)")
    pe.add_argument("--out", required=True, help="output torch .pt")
    px = sub.add_parser("export-ema")
    px.add_argument("--result-dir", required=True, help="experiment dir with ema/*.npz")
    px.add_argument("--out", required=True, help="output directory for <std>_<step>.pt files")
    args = p.parse_args()
    {"import": do_import, "export": do_export, "export-ema": do_export_ema}[args.cmd](args)


if __name__ == "__main__":
    main()
