"""Pallas fused cosine-attention kernel vs the XLA reference path.

On CPU the kernel runs in interpreter mode — same kernel code, same
numerics contract (SURVEY.md §2.7: the attention kernel must not be a
Python stand-in; the XLA path remains as the A/B + fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdit_tpu.ops.attention import _xla_attention, dot_product_attention
from mapdit_tpu.ops.mp import normalize
from mapdit_tpu.ops.pallas.attention import fused_attention


@pytest.fixture(scope="module")
def qkv():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    shape = (2, 4, 64, 64)  # (B, H, T, D')
    return tuple(jax.random.normal(k, shape) for k in ks)


class TestFusedAttention:
    def test_matches_xla_cosine(self, qkv):
        q, k, v = qkv
        ours = fused_attention(q, k, v, 0.125, True)
        ref = _xla_attention(normalize(q), normalize(k), v, 0.125)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_matches_xla_plain(self, qkv):
        q, k, v = qkv
        ours = fused_attention(q, k, v, 0.125, False)
        ref = _xla_attention(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_odd_head_dim(self):
        """XL-style head_dim=72 (not 128-aligned) must still work."""
        key = jax.random.PRNGKey(1)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (1, 2, 16, 72)) for i in range(3))
        ours = fused_attention(q, k, v, 72**-0.5, True)
        ref = _xla_attention(normalize(q), normalize(k), v, 72**-0.5)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_vjp_matches_xla(self, qkv):
        q, k, v = qkv

        def f_pallas(q, k, v):
            return jnp.sum(fused_attention(q, k, v, 0.125, True) ** 2)

        def f_xla(q, k, v):
            return jnp.sum(_xla_attention(normalize(q), normalize(k), v, 0.125) ** 2)

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)

    def test_dispatch_impl_flag(self, qkv):
        q, k, v = qkv
        a = dot_product_attention(q, k, v, 0.125, cosine=True, impl="xla")
        b = dot_product_attention(q, k, v, 0.125, cosine=True, impl="pallas")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self, qkv):
        q, k, v = (z.astype(jnp.bfloat16) for z in qkv)
        out = fused_attention(q, k, v, 0.125, True)
        assert out.dtype == jnp.bfloat16
        ref = _xla_attention(normalize(q), normalize(k), v, 0.125)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
        )
