"""SD-VAE (AutoencoderKL) port tests: architecture shapes + diffusers weight
import mapping (no pretrained weights in this offline environment; numerical
parity vs sd-vae-ft-mse requires network access and is validated by shape/
key-coverage here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.models.vae import AutoencoderKL, _torch_key_to_flax


@pytest.fixture(scope="module")
def vae():
    model = AutoencoderKL()
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x, mode="encode")
    return model, variables


class TestShapes:
    def test_encode_shapes(self, vae):
        model, variables = vae
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
        mean, std = model.apply(variables, x, method=AutoencoderKL.encode)
        assert mean.shape == (2, 4, 8, 8)
        assert std.shape == (2, 4, 8, 8)
        assert (np.asarray(std) > 0).all()

    def test_decode_shapes(self, vae):
        model, variables = vae
        # decode params are initialized lazily; init a decode pass
        dec_vars = AutoencoderKL().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), mode="decode"
        )
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
        img = AutoencoderKL().apply(dec_vars, z, method=AutoencoderKL.decode)
        assert img.shape == (2, 3, 64, 64)
        assert np.isfinite(np.asarray(img)).all()


class TestWeightImportMapping:
    DIFFUSERS_KEYS = [
        ("encoder.conv_in", ("encoder", "conv_in")),
        ("encoder.down_blocks.0.resnets.1.norm2", ("encoder", "down_0_resnet_1", "norm2")),
        ("encoder.down_blocks.2.downsamplers.0.conv", ("encoder", "down_2_downsample")),
        ("encoder.mid_block.resnets.0.conv1", ("encoder", "mid", "resnets_0", "conv1")),
        ("encoder.mid_block.attentions.0.to_q", ("encoder", "mid", "attentions_0", "to_q")),
        ("encoder.conv_norm_out", ("encoder", "conv_norm_out")),
        ("encoder.conv_out", ("encoder", "conv_out")),
        ("quant_conv", ("quant_conv",)),
        ("post_quant_conv", ("post_quant_conv",)),
        ("decoder.conv_in", ("decoder", "conv_in")),
        ("decoder.up_blocks.3.resnets.2.conv2", ("decoder", "up_3_resnet_2", "conv2")),
        ("decoder.up_blocks.0.upsamplers.0.conv", ("decoder", "up_0_upsample")),
        ("decoder.mid_block.attentions.0.group_norm", ("decoder", "mid", "attentions_0", "group_norm")),
    ]

    def test_key_mapping(self):
        for torch_key, expect in self.DIFFUSERS_KEYS:
            assert _torch_key_to_flax(torch_key) == expect, torch_key

    def test_loader_covers_all_params(self, vae, tmp_path):
        """Fabricate a diffusers-style checkpoint from our own init (reverse
        mapping), load it, and require the loaded tree to match the model's
        full param structure — proves every param is reachable by the loader."""
        model, enc_vars = vae
        dec_vars = AutoencoderKL().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), mode="decode"
        )
        # merge encode-init and decode-init param trees
        params = dict(enc_vars["params"])
        params.update(dec_vars["params"])

        # build the torch-style state dict by inverting the mapping
        def emit(prefix_parts, tree, out):
            for k, v in tree.items():
                if isinstance(v, dict):
                    emit(prefix_parts + [k], v, out)
                else:
                    out[tuple(prefix_parts + [k])] = np.asarray(v)

        flat: dict = {}
        emit([], params, flat)

        inverse = {}
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
        for cand in candidates:
            base = cand[: -2] if cand.endswith(".0") else cand
            mapped = _torch_key_to_flax(base)
            if mapped is not None:
                inverse[mapped] = cand

        sd = {}
        for path, val in flat.items():
            mod_path, leaf = path[:-1], path[-1]
            torch_base = inverse.get(tuple(mod_path))
            assert torch_base is not None, mod_path
            if leaf == "kernel":
                # safetensors mis-serializes non-contiguous views; copy first
                if val.ndim == 4:
                    sd[f"{torch_base}.weight"] = np.ascontiguousarray(val.transpose(3, 2, 0, 1))
                else:
                    sd[f"{torch_base}.weight"] = np.ascontiguousarray(val.T)
            elif leaf == "scale":
                sd[f"{torch_base}.weight"] = val
            else:
                sd[f"{torch_base}.bias"] = val

        from safetensors.numpy import save_file

        path = str(tmp_path / "vae.safetensors")
        save_file(sd, path)

        from mapdit_tpu.models.vae import load_vae_variables

        loaded = load_vae_variables(path)
        ref_shapes = jax.tree_util.tree_map(jnp.shape, params)
        got_shapes = jax.tree_util.tree_map(jnp.shape, loaded["params"])
        assert ref_shapes == got_shapes
        # values round-trip exactly
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["encoder"]["conv_in"]["kernel"]),
            np.asarray(params["encoder"]["conv_in"]["kernel"]),
        )


class TestLoaderHardening:
    def test_legacy_attention_naming_maps(self):
        """Pre-0.15 diffusers AttentionBlock keys (query/key/value/proj_attn)
        map to the same params as the modern to_q/to_k/to_v/to_out.0 names."""
        for old, new in [("query", "to_q"), ("key", "to_k"),
                         ("value", "to_v"), ("proj_attn", "to_out")]:
            assert _torch_key_to_flax(f"decoder.mid_block.attentions.0.{old}") == (
                "decoder", "mid", "attentions_0", new
            ), old

    def test_unmapped_keys_raise(self, tmp_path):
        """A checkpoint with drifted key names must fail loudly, not decode
        garbage from a half-initialized tree."""
        from safetensors.numpy import save_file

        from mapdit_tpu.models.vae import load_vae_variables

        path = str(tmp_path / "bad.safetensors")
        save_file({
            "decoder.conv_in.weight": np.zeros((4, 4, 3, 3), np.float32),
            "decoder.some_new_block.0.weight": np.zeros((4, 4), np.float32),
        }, path)
        with pytest.raises(KeyError, match="some_new_block"):
            load_vae_variables(path)


# --------------------------------------------------------------------------- #
# Independent numerical validation of the VAE building blocks against
# hand-rolled numpy math (real-weight parity vs sd-vae-ft-mse stays
# network-gated; these pin the architecture choices the weights rely on:
# GroupNorm(32, eps=1e-6) statistics, silu placement, residuals, the
# single-head attention scale 1/sqrt(c), diffusers' asymmetric downsample
# padding, and nearest-neighbor upsampling).

def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_group_norm(x, scale, bias, groups=32, eps=1e-6):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mu) / np.sqrt(var + eps)).reshape(b, h, w, c)
    return xn * scale + bias


def _np_conv(x, w, b, stride=1, pad=1):
    from numpy.lib.stride_tricks import sliding_window_view

    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
    kh, kw, _, _ = w.shape
    win = sliding_window_view(xp, (kh, kw), axis=(1, 2))  # (b,oh,ow,ci,kh,kw)
    win = win[:, ::stride, ::stride]
    return np.einsum("bijckl,klco->bijo", win, w, optimize=True) + b


class TestNumericsVsNumpy:
    def test_resnet_block(self):
        from mapdit_tpu.models.vae import ResnetBlock

        x = np.random.default_rng(0).normal(size=(2, 6, 6, 32)).astype(np.float32)
        mod = ResnetBlock(64)
        variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        h = _np_silu(_np_group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"]))
        h = _np_conv(h, p["conv1"]["kernel"], p["conv1"]["bias"])
        h = _np_silu(_np_group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"]))
        h = _np_conv(h, p["conv2"]["kernel"], p["conv2"]["bias"])
        sc = _np_conv(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"], pad=0)
        expect = sc + h

        got = np.asarray(mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)

    def test_attention_block(self):
        from mapdit_tpu.models.vae import AttentionBlock

        c = 64
        x = np.random.default_rng(2).normal(size=(2, 4, 4, c)).astype(np.float32)
        mod = AttentionBlock(c)
        variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        y = _np_group_norm(x, p["group_norm"]["scale"], p["group_norm"]["bias"]).reshape(2, 16, c)
        dense = lambda name, z: z @ p[name]["kernel"] + p[name]["bias"]
        q, k, v = dense("to_q", y), dense("to_k", y), dense("to_v", y)
        logits = np.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c)
        attn = np.exp(logits - logits.max(-1, keepdims=True))
        attn /= attn.sum(-1, keepdims=True)
        out = dense("to_out", np.einsum("bqk,bkc->bqc", attn, v))
        expect = x + out.reshape(2, 4, 4, c)

        got = np.asarray(mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)

    def test_downsample_asymmetric_pad(self):
        """Diffusers downsamples with pad (0,1,0,1) + stride-2 VALID conv —
        NOT symmetric SAME padding. Verify against explicit numpy."""
        x = np.random.default_rng(4).normal(size=(1, 6, 6, 32)).astype(np.float32)
        conv = __import__("flax").linen.Conv(32, (3, 3), strides=2, padding="VALID")
        xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
        variables = conv.init(jax.random.PRNGKey(5), xp)
        got = np.asarray(conv.apply(variables, xp))
        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        xpad = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        expect = _np_conv(xpad, p["kernel"], p["bias"], stride=2, pad=0)
        assert got.shape == (1, 3, 3, 32)
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)

    def test_nearest_upsample(self):
        x = np.random.default_rng(6).normal(size=(1, 3, 3, 8)).astype(np.float32)
        got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 6, 6, 8), method="nearest"))
        expect = x.repeat(2, axis=1).repeat(2, axis=2)
        np.testing.assert_array_equal(got, expect)


# --------------------------------------------------------------------------- #
# FULL-graph numpy oracle (VERDICT r02 item #5): an independent numpy
# implementation of the complete diffusers AutoencoderKL spec — the whole
# asymmetric-pad downsample chain, mid attention, groupnorm/silu ordering,
# quant convs, logvar clamp — asserted against the flax graph at random
# weights. With this, the only remaining weights-day risk is key naming
# (covered loudly by TestWeightImportMapping / TestLoaderHardening).

def _np_resnet(p, x):
    h = _np_silu(_np_group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"]))
    h = _np_conv(h, p["conv1"]["kernel"], p["conv1"]["bias"])
    h = _np_silu(_np_group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"]))
    h = _np_conv(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = _np_conv(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"], pad=0)
    return x + h


def _np_attention(p, x):
    b, h, w, c = x.shape
    y = _np_group_norm(x, p["group_norm"]["scale"], p["group_norm"]["bias"])
    y = y.reshape(b, h * w, c)
    dense = lambda name, z: z @ p[name]["kernel"] + p[name]["bias"]
    q, k, v = dense("to_q", y), dense("to_k", y), dense("to_v", y)
    logits = np.einsum("bqc,bkc->bqk", q, k) / np.sqrt(np.float32(c))
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    out = dense("to_out", np.einsum("bqk,bkc->bqc", attn, v))
    return x + out.reshape(b, h, w, c)


def _np_mid(p, x):
    x = _np_resnet(p["resnets_0"], x)
    x = _np_attention(p["attentions_0"], x)
    return _np_resnet(p["resnets_1"], x)


def _np_encoder(p, x):
    from mapdit_tpu.models.vae import BLOCK_CHANNELS

    x = _np_conv(x, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    for i in range(len(BLOCK_CHANNELS)):
        for j in range(2):
            x = _np_resnet(p[f"down_{i}_resnet_{j}"], x)
        if i < len(BLOCK_CHANNELS) - 1:
            x = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            d = p[f"down_{i}_downsample"]
            x = _np_conv(x, d["kernel"], d["bias"], stride=2, pad=0)
    x = _np_mid(p["mid"], x)
    x = _np_silu(
        _np_group_norm(x, p["conv_norm_out"]["scale"], p["conv_norm_out"]["bias"])
    )
    return _np_conv(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])


def _np_decoder(p, z):
    from mapdit_tpu.models.vae import BLOCK_CHANNELS

    rev = tuple(reversed(BLOCK_CHANNELS))
    x = _np_conv(z, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    x = _np_mid(p["mid"], x)
    for i in range(len(rev)):
        for j in range(3):
            x = _np_resnet(p[f"up_{i}_resnet_{j}"], x)
        if i < len(rev) - 1:
            x = x.repeat(2, axis=1).repeat(2, axis=2)
            u = p[f"up_{i}_upsample"]
            x = _np_conv(x, u["kernel"], u["bias"])
    x = _np_silu(
        _np_group_norm(x, p["conv_norm_out"]["scale"], p["conv_norm_out"]["bias"])
    )
    return _np_conv(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])


class TestFullGraphVsNumpy:
    def test_encode_full_graph(self):
        from mapdit_tpu.models.vae import AutoencoderKL

        x = np.random.default_rng(7).normal(size=(1, 3, 32, 32)).astype(np.float32)
        model = AutoencoderKL()
        variables = model.init(jax.random.PRNGKey(8), jnp.asarray(x), mode="encode")
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        h = _np_encoder(p["encoder"], x.transpose(0, 2, 3, 1))
        q = p["quant_conv"]
        moments = _np_conv(h, q["kernel"], q["bias"], pad=0).transpose(0, 3, 1, 2)
        mean_e, logvar_e = np.split(moments, 2, axis=1)
        std_e = np.exp(0.5 * np.clip(logvar_e, -30.0, 20.0))

        mean, std = model.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
        assert mean.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(mean), mean_e, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(std), std_e, rtol=2e-3, atol=2e-3)

    def test_decode_full_graph(self):
        from mapdit_tpu.models.vae import AutoencoderKL

        z = np.random.default_rng(9).normal(size=(1, 4, 4, 4)).astype(np.float32)
        model = AutoencoderKL()
        variables = model.init(jax.random.PRNGKey(10), jnp.asarray(z), mode="decode")
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        pq = p["post_quant_conv"]
        h = _np_conv(z.transpose(0, 2, 3, 1), pq["kernel"], pq["bias"], pad=0)
        img_e = _np_decoder(p["decoder"], h).transpose(0, 3, 1, 2)

        img = model.apply(variables, jnp.asarray(z), method=AutoencoderKL.decode)
        assert img.shape == (1, 3, 32, 32)
        np.testing.assert_allclose(np.asarray(img), img_e, rtol=2e-3, atol=2e-3)
