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
