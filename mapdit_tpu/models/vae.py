"""Stable-Diffusion AutoencoderKL (VAE) — JAX/Flax port.

The reference reaches the VAE through `diffusers.AutoencoderKL.from_pretrained
("stabilityai/sd-vae-ft-mse")` (`download_data.py:23`, `sample.py:72`,
`sample_fid.py:41`, `sample_ema.py:73`) — an external pretrained model
(SURVEY.md L8). This module is a TPU-native reimplementation of that exact
architecture (encoder: 4 down blocks (128,256,512,512) x2 resnets + mid
attn; decoder mirrored with 3-resnet up blocks; GroupNorm(32) + SiLU;
single-head spatial attention in the mid block) with a weight loader for
locally-available diffusers checkpoints (safetensors or torch .bin) — this
environment has no network egress, so weights must be provided via
``--vae-path``.

Latent contract parity: `encode` returns the raw posterior (mean, std) with
logvar clamped to [-30, 20]; no 0.18215 scaling factor anywhere — the
reference normalizes by dataset MoG stats instead (`download_data.py:55-58`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

BLOCK_CHANNELS = (128, 256, 512, 512)
LATENT_CHANNELS = 4
NORM_GROUPS = 32


def _gn(name: str):
    return nn.GroupNorm(num_groups=NORM_GROUPS, epsilon=1e-6, name=name)


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.silu(_gn("norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.silu(_gn("norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = _gn("group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.float32(c)), axis=-1
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class MidBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ResnetBlock(self.channels, name="resnets_0")(x)
        x = AttentionBlock(self.channels, name="attentions_0")(x)
        return ResnetBlock(self.channels, name="resnets_1")(x)


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(BLOCK_CHANNELS[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(BLOCK_CHANNELS):
            for j in range(2):
                x = ResnetBlock(ch, name=f"down_{i}_resnet_{j}")(x)
            if i < len(BLOCK_CHANNELS) - 1:
                # diffusers downsample: asymmetric pad (0,1,0,1) + stride-2 conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID", name=f"down_{i}_downsample"
                )(x)
        x = MidBlock(BLOCK_CHANNELS[-1], name="mid")(x)
        x = nn.silu(_gn("conv_norm_out")(x))
        return nn.Conv(2 * LATENT_CHANNELS, (3, 3), padding=1, name="conv_out")(x)


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, z: Array) -> Array:
        rev = tuple(reversed(BLOCK_CHANNELS))  # (512, 512, 256, 128)
        x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
        x = MidBlock(rev[0], name="mid")(x)
        for i, ch in enumerate(rev):
            for j in range(3):
                x = ResnetBlock(ch, name=f"up_{i}_resnet_{j}")(x)
            if i < len(rev) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
                x = nn.Conv(ch, (3, 3), padding=1, name=f"up_{i}_upsample")(x)
        x = nn.silu(_gn("conv_norm_out")(x))
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Full VAE; NCHW external interface to match the rest of the codebase."""

    def setup(self):
        self.encoder = Encoder()
        self.decoder = Decoder()
        self.quant_conv = nn.Conv(2 * LATENT_CHANNELS, (1, 1))
        self.post_quant_conv = nn.Conv(LATENT_CHANNELS, (1, 1))

    def __call__(self, x: Array, mode: str = "decode") -> Array:
        if mode == "encode":
            return self.encode(x)
        return self.decode(x)

    def encode(self, x: Array) -> Tuple[Array, Array]:
        """(N, 3, H, W) in [-1,1] -> posterior (mean, std), each (N, 4, H/8, W/8)."""
        h = self.encoder(x.transpose(0, 2, 3, 1))
        moments = self.quant_conv(h).transpose(0, 3, 1, 2)
        mean, logvar = jnp.split(moments, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, jnp.exp(0.5 * logvar)

    def decode(self, z: Array) -> Array:
        """(N, 4, H/8, W/8) latents -> (N, 3, H, W) image in ~[-1,1]."""
        z = self.post_quant_conv(z.transpose(0, 2, 3, 1))
        return self.decoder(z).transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------- #
# diffusers checkpoint import

def _torch_key_to_flax(key: str) -> Optional[Tuple[str, ...]]:
    """Map a diffusers AutoencoderKL state-dict key to our flax param path."""
    parts = key.split(".")

    def resnet(where, i, j, rest):
        # unknown sub-names return None so the loader reports them as
        # unmapped keys instead of raising a bare KeyError mid-scan
        if not rest:
            return None
        name = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
                "conv2": "conv2", "conv_shortcut": "conv_shortcut"}.get(rest[0])
        if name is None:
            return None
        return (*where, f"{'down' if where[0]=='encoder' else 'up'}_{i}_resnet_{j}", name)

    if parts[0] in ("quant_conv", "post_quant_conv"):
        return (parts[0],)
    side = parts[0]  # encoder / decoder
    if side not in ("encoder", "decoder"):
        return None
    body = parts[1:]
    if body[0] == "conv_in":
        return (side, "conv_in")
    if body[0] == "conv_out":
        return (side, "conv_out")
    if body[0] == "conv_norm_out":
        return (side, "conv_norm_out")
    if body[0] in ("down_blocks", "up_blocks"):
        i = int(body[1])
        if body[2] == "resnets":
            return resnet((side,), i, int(body[3]), body[4:])
        if body[2] in ("downsamplers", "upsamplers"):
            kind = "downsample" if body[2] == "downsamplers" else "upsample"
            pre = "down" if body[2] == "downsamplers" else "up"
            return (side, f"{pre}_{i}_{kind}")
    if body[0] == "mid_block":
        if body[1] == "resnets":
            return (side, "mid", f"resnets_{int(body[2])}", body[3])
        if body[1] == "attentions":
            name = {"group_norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
                    "to_v": "to_v", "to_out": "to_out", "query": "to_q",
                    "key": "to_k", "value": "to_v", "proj_attn": "to_out"}.get(body[3])
            if name is None:
                return None
            return (side, "mid", "attentions_0", name)
    return None


def load_vae_variables(path: str) -> dict:
    """Load diffusers AutoencoderKL weights (safetensors or torch) into our
    flax variable tree. Conv kernels transpose (O,I,H,W)->(H,W,I,O); Dense
    kernels (O,I)->(I,O)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
        }

    params: dict = {}
    unmapped = []
    for key, val in sd.items():
        parts = key.rsplit(".", 1)
        base, leaf = parts[0], parts[1]
        if base.endswith("to_out.0") or base.endswith("proj_attn"):
            base = base.rsplit(".", 1)[0] if base.endswith(".0") else base
        path_t = _torch_key_to_flax(base)
        if path_t is None:
            unmapped.append(key)
            continue
        val = np.asarray(val)
        if leaf == "weight":
            if val.ndim == 4:  # conv
                val = val.transpose(2, 3, 1, 0)
                leaf_name = "kernel"
            elif val.ndim == 2:  # dense
                val = val.T
                leaf_name = "kernel"
            else:  # norm scale
                leaf_name = "scale"
        else:
            leaf_name = "bias"
        node = params
        for p in path_t:
            node = node.setdefault(p, {})
        node[leaf_name] = jnp.asarray(val)
    if unmapped:
        # Fail loudly: a silently half-initialized VAE decodes garbage.
        # Diffusers has renamed attention keys across versions (query/key/
        # value/proj_attn -> to_q/to_k/to_v/to_out.0 — both are mapped);
        # any residue here means a naming drift the mapping must learn.
        raise KeyError(
            f"unmapped diffusers VAE keys (naming drift?): {sorted(unmapped)[:8]}"
            f"{' ...' if len(unmapped) > 8 else ''}"
        )
    return {"params": params}


def load_decoder(vae_path: Optional[str]):
    """jitted latents->image decode fn from local weights, or None if
    unavailable (callers fall back to raw latents with a warning)."""
    if not vae_path or not os.path.exists(vae_path):
        return None
    variables = load_vae_variables(vae_path)
    model = AutoencoderKL()

    @jax.jit
    def decode(z):
        return model.apply(variables, z, method=AutoencoderKL.decode)

    return decode


def load_encoder(vae_path: Optional[str]):
    if not vae_path or not os.path.exists(vae_path):
        return None
    variables = load_vae_variables(vae_path)
    model = AutoencoderKL()

    @jax.jit
    def encode(x):
        return model.apply(variables, x, method=AutoencoderKL.encode)

    return encode
