"""Gradient parity vs the reference: full training-loss backward at
identical weights/inputs (SURVEY.md §4.1 extended to the backward pass).

Covers, end to end: the in-graph weight-normalization gradient (perpendicular
to weight rows), the learned-gain stop-gradient denominator semantics, the
frozen-mean VB term, the MPScale sigmoid heads, and the eps-MSE objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.diffusion import create_diffusion
from mapdit_tpu.models import DiT, build_config
from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

GRAD_KEYS = {
    "x_embedder.weight": ("x_embedder", "weight"),
    "blocks.0.attn.qkv_proj.weight": ("blocks_0", "attn", "qkv_proj", "weight"),
    "blocks.0.gain_msa": ("blocks_0", "gain_msa"),
    "blocks.5.mlp.net.0.weight": ("blocks_5", "mlp", "fc1", "weight"),
    "blocks.5.modulation.1.weight": ("blocks_5", "modulation", "linear", "weight"),
    "final_layer.linear.weight": ("final_layer", "linear", "weight"),
    "final_layer.gain_mod": ("final_layer", "gain_mod"),
    "final_layer.mean_scale.reference": ("final_layer", "mean_scale", "reference"),
    "y_embedder.embedding.weight": ("y_embedder", "embedding", "weight"),
}


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def test_training_loss_gradients_match_reference(golden):
    g = golden("gradients")
    sd = {k[len("sd.") :]: v for k, v in g.items() if k.startswith("sd.")}
    variables = variables_from_torch_state_dict(sd)

    cfg = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10)
    model = DiT(cfg)
    diffusion = create_diffusion("")

    x0 = jnp.asarray(g["x0"])
    noise = jnp.asarray(g["noise"])
    t = jnp.asarray(g["t"], jnp.int32)
    y = jnp.asarray(g["y"], jnp.int32)

    def loss_fn(params):
        def model_fn(xt, tt, y):
            return model.apply(
                {"params": params, "constants": variables["constants"]}, xt, tt, y
            )

        terms = diffusion.training_losses(
            model_fn, x0, t, model_kwargs={"y": y}, noise=noise
        )
        return jnp.mean(terms["loss"])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss), float(g["loss"]), rtol=1e-4)

    for torch_name, path in GRAD_KEYS.items():
        ours = np.asarray(_get(grads, path))
        ref = g[f"grad.{torch_name}"]
        scale = np.abs(ref).max() + 1e-8
        np.testing.assert_allclose(
            ours / scale, ref / scale, rtol=5e-3, atol=2e-4, err_msg=torch_name
        )
