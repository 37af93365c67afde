#!/usr/bin/env python
"""Fabricate a random-weight diffusers-format SD-VAE checkpoint.

The real `stabilityai/sd-vae-ft-mse` weights are network-gated in this
environment (reference `download_data.py:23`); this tool writes a
`vae.safetensors` with the exact diffusers AutoencoderKL key/shape layout
by inverting our own loader mapping (`mapdit_tpu/models/vae.py:150`), so
the FULL offline pipeline — download_data.py encode -> stats -> train — can
be executed end to end without network access. The values are our flax
init (random), so outputs are not SD-VAE outputs; the *plumbing* (key
naming, shapes, transposes, artifact format) is exercised for real.

Usage: python tools/fake_vae.py --output /path/vae.safetensors [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_state_dict(seed: int = 0) -> dict:
    """Diffusers-style torch state dict (numpy values) covering every param
    of the AutoencoderKL graph, built by inverting `_torch_key_to_flax`."""
    import jax
    import jax.numpy as jnp

    from mapdit_tpu.models.vae import AutoencoderKL, _torch_key_to_flax

    model = AutoencoderKL()
    enc = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3, 32, 32)), mode="encode")
    dec = model.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, 4, 8, 8)), mode="decode")
    params = dict(enc["params"])
    params.update(dec["params"])

    flat: dict = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                emit(prefix + [k], v)
            else:
                flat[tuple(prefix + [k])] = np.asarray(v)

    emit([], params)

    # invert the loader's torch->flax key mapping over the known key space
    candidates = (
        ["quant_conv", "post_quant_conv", "encoder.conv_in", "encoder.conv_out",
         "encoder.conv_norm_out", "decoder.conv_in", "decoder.conv_out",
         "decoder.conv_norm_out"]
        + [f"encoder.down_blocks.{i}.resnets.{j}.{nm}" for i in range(4) for j in range(2)
           for nm in ("norm1", "conv1", "norm2", "conv2", "conv_shortcut")]
        + [f"encoder.down_blocks.{i}.downsamplers.0.conv" for i in range(3)]
        + [f"decoder.up_blocks.{i}.resnets.{j}.{nm}" for i in range(4) for j in range(3)
           for nm in ("norm1", "conv1", "norm2", "conv2", "conv_shortcut")]
        + [f"decoder.up_blocks.{i}.upsamplers.0.conv" for i in range(3)]
        + [f"{s}.mid_block.resnets.{j}.{nm}" for s in ("encoder", "decoder")
           for j in range(2) for nm in ("norm1", "conv1", "norm2", "conv2")]
        + [f"{s}.mid_block.attentions.0.{nm}" for s in ("encoder", "decoder")
           for nm in ("group_norm", "to_q", "to_k", "to_v", "to_out.0")]
    )
    inverse = {}
    for cand in candidates:
        base = cand[:-2] if cand.endswith(".0") else cand
        mapped = _torch_key_to_flax(base)
        if mapped is not None:
            inverse[mapped] = cand

    sd = {}
    for path, val in flat.items():
        mod_path, leaf = path[:-1], path[-1]
        torch_base = inverse.get(tuple(mod_path))
        assert torch_base is not None, f"unmapped flax path {mod_path}"
        if leaf == "kernel":
            if val.ndim == 4:  # HWIO -> OIHW
                sd[f"{torch_base}.weight"] = np.ascontiguousarray(val.transpose(3, 2, 0, 1))
            else:  # dense (in, out) -> (out, in)
                sd[f"{torch_base}.weight"] = np.ascontiguousarray(val.T)
        elif leaf == "scale":
            sd[f"{torch_base}.weight"] = val
        else:
            sd[f"{torch_base}.bias"] = val
    return sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True, help="path for the .safetensors file")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from safetensors.numpy import save_file

    sd = fabricate_state_dict(args.seed)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    save_file(sd, args.output)
    print(f"wrote {len(sd)} tensors to {args.output}")


if __name__ == "__main__":
    main()
