"""Golden + property tests for the MP math primitives (SURVEY.md §4.1-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from mapdit_tpu.ops import (
    get_2d_sincos_pos_embed,
    magnitude,
    modulate,
    mp_silu,
    mp_sum,
    normalize,
    patchify,
    rotate_pairs,
    unpatchify,
)

TOL = dict(rtol=1e-5, atol=1e-5)


class TestGoldenParity:
    def test_magnitude(self, golden):
        g = golden("mp_ops")
        np.testing.assert_allclose(magnitude(g["x"]), g["magnitude"], **TOL)

    def test_mp_sum(self, golden):
        g = golden("mp_ops")
        np.testing.assert_allclose(mp_sum(g["x"], g["a"], 0.3), g["mp_sum_03"], **TOL)
        np.testing.assert_allclose(mp_sum(g["x"], g["a"], 0.5), g["mp_sum_05"], **TOL)
        np.testing.assert_allclose(
            mp_sum(g["x"], g["a"], jnp.asarray(g["tensor_t"])),
            g["mp_sum_tensor_t"],
            **TOL,
        )

    def test_modulate(self, golden):
        g = golden("mp_ops")
        np.testing.assert_allclose(
            modulate(g["x"], g["shift"], g["scale"], 0.0), g["modulate_0"], **TOL
        )
        np.testing.assert_allclose(
            modulate(g["x"], g["shift"], g["scale"], jnp.asarray(g["tensor_t"])),
            g["modulate_tensor"],
            **TOL,
        )

    def test_normalize(self, golden):
        g = golden("mp_ops")
        np.testing.assert_allclose(normalize(g["x"]), g["normalize_x"], **TOL)
        np.testing.assert_allclose(normalize(g["w"]), g["normalize_w"], **TOL)

    def test_chunk_normalize_equals_rowwise(self, golden):
        # Reference chunk_normalize(w, n) is per-row normalization regardless
        # of n (src/utils.py:26-34) — our single normalize covers it.
        g = golden("mp_ops")
        np.testing.assert_allclose(normalize(g["w"]), g["chunk_normalize_w3"], **TOL)

    def test_patchify(self, golden):
        g = golden("mp_ops")
        np.testing.assert_allclose(patchify(g["img"], 2), g["patchify_p2"], **TOL)
        np.testing.assert_allclose(patchify(g["img"], 4), g["patchify_p4"], **TOL)
        np.testing.assert_allclose(
            unpatchify(patchify(g["img"], 2), 16, 2), g["img"], **TOL
        )

    def test_pos_embed(self, golden):
        g = golden("pos_embed")
        np.testing.assert_allclose(
            get_2d_sincos_pos_embed(256, 8), g["table_256_8"], rtol=1e-12
        )
        np.testing.assert_allclose(
            get_2d_sincos_pos_embed(64, 4), g["table_64_4"], rtol=1e-12
        )


class TestStopGradientSemantics:
    """The mp_sum denominator must be constant w.r.t. the learned gain t
    (reference coerces the 0-dim tensor through math.sqrt — SURVEY.md §2.1)."""

    def test_grad_t_flows_only_through_lerp(self):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (4, 8))
        b = jax.random.normal(jax.random.fold_in(key, 1), (4, 8))
        t0 = jnp.asarray(0.3)

        grad = jax.grad(lambda t: jnp.sum(mp_sum(a, b, t)))(t0)
        # lerp-only gradient: d/dt sum((a + (b-a)t) / const) = sum(b-a)/const
        const = np.sqrt((1 - 0.3) ** 2 + 0.3**2)
        np.testing.assert_allclose(grad, jnp.sum(b - a) / const, rtol=1e-5)

    def test_python_float_t_matches_tensor_t_value(self):
        a = jnp.ones((2, 3))
        b = jnp.full((2, 3), 2.0)
        np.testing.assert_allclose(
            mp_sum(a, b, 0.3), mp_sum(a, b, jnp.asarray(0.3)), rtol=1e-6
        )


class TestMagnitudePreservation:
    """RMS ≈ 1 preservation properties (SURVEY.md §4.2)."""

    def setup_method(self):
        self.key = jax.random.PRNGKey(42)

    def test_mp_sum_preserves_magnitude(self):
        a = jax.random.normal(self.key, (64, 256))
        b = jax.random.normal(jax.random.fold_in(self.key, 1), (64, 256))
        for t in (0.3, 0.5, 0.7):
            m = float(magnitude(mp_sum(a, b, t)))
            assert abs(m - 1.0) < 0.05, (t, m)

    def test_mp_silu_unit_second_moment(self):
        x = jax.random.normal(self.key, (1 << 16,))
        second_moment = float(jnp.mean(jnp.square(mp_silu(x))))
        assert abs(second_moment - 1.0) < 0.02, second_moment

    def test_normalize_unit_rms_rows(self):
        x = jax.random.normal(self.key, (32, 128)) * 7.3
        rms = jnp.sqrt(jnp.mean(jnp.square(normalize(x)), axis=-1))
        np.testing.assert_allclose(rms, 1.0, atol=1e-3)

    def test_rotation_preserves_magnitude_exactly(self):
        x = jax.random.normal(self.key, (4, 16, 64))
        theta = jax.random.normal(jax.random.fold_in(self.key, 2), (4, 32)) * 3.0
        np.testing.assert_allclose(
            jnp.linalg.norm(rotate_pairs(x, theta), axis=-1),
            jnp.linalg.norm(x, axis=-1),
            rtol=1e-5,
        )

    def test_rotation_zero_angle_is_identity(self):
        x = jax.random.normal(self.key, (2, 8, 32))
        np.testing.assert_allclose(rotate_pairs(x, jnp.zeros((2, 16))), x, rtol=1e-6)

    def test_rotation_composes_additively(self):
        x = jax.random.normal(self.key, (2, 8, 32))
        t1 = jax.random.normal(jax.random.fold_in(self.key, 3), (2, 16))
        t2 = jax.random.normal(jax.random.fold_in(self.key, 4), (2, 16))
        np.testing.assert_allclose(
            rotate_pairs(rotate_pairs(x, t1), t2),
            rotate_pairs(x, t1 + t2),
            rtol=1e-4,
            atol=1e-5,
        )
