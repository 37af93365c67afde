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
        for impl in ("pallas", "pallas_v2", "pallas_v3"):
            b = dot_product_attention(q, k, v, 0.125, cosine=True, impl=impl)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("cosine", [True, False])
    def test_v3_packed_matches_xla(self, qkv, cosine):
        """v3 packs head pairs along the token axis with block-diagonal
        masking — must be numerically the same attention."""
        q, k, v = qkv
        ours = fused_attention(q, k, v, 0.125, cosine, "v3")
        if cosine:
            q, k = normalize(q), normalize(k)
        ref = _xla_attention(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_v3_odd_heads_falls_back(self):
        """H=3 can't pair-pack; version='v3' must silently use v2 and stay
        correct."""
        key = jax.random.PRNGKey(2)
        q, k, v = (
            jax.random.normal(jax.random.fold_in(key, i), (2, 3, 32, 64))
            for i in range(3)
        )
        ours = fused_attention(q, k, v, 0.125, True, "v3")
        ref = _xla_attention(normalize(q), normalize(k), v, 0.125)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self, qkv):
        q, k, v = (z.astype(jnp.bfloat16) for z in qkv)
        out = fused_attention(q, k, v, 0.125, True)
        assert out.dtype == jnp.bfloat16
        ref = _xla_attention(normalize(q), normalize(k), v, 0.125)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
        )


class TestFusedMLPBlock:
    """Fused MP-MLP half-block kernel vs the unfused model path."""

    def test_full_model_parity(self, golden):
        """DiT-XS/2 forward with block_kernel=pallas (interpret on CPU) must
        match the reference golden like the unfused path does."""
        from mapdit_tpu.models import DiT, build_config
        from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

        g = golden("dit_xs2")
        sd = {k[len("sd.") :]: v for k, v in g.items() if k.startswith("sd.")}
        variables = variables_from_torch_state_dict(sd)
        cfg = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
            block_kernel="pallas",
        )
        out = DiT(cfg).apply(
            variables, jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(g["y"])
        )
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=2e-4, atol=2e-4)

    def test_fused_vs_unfused_model(self):
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 321.0)
        y = jnp.ones((2,), jnp.int32)
        a = DiT(base).apply(variables, x, t, y)
        b = DiT(base.replace(block_kernel="pallas")).apply(variables, x, t, y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_fused_gradients_match(self):
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 100.0)
        y = jnp.ones((2,), jnp.int32)

        def loss(cfg):
            def f(params):
                out = DiT(cfg).apply(
                    {"params": params, "constants": variables["constants"]}, x, t, y
                )
                return jnp.sum(out**2)

            return jax.grad(f)(variables["params"])

        ga = loss(base)
        gb = loss(base.replace(block_kernel="pallas"))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            ga,
            gb,
        )


class TestDiTBlockMegakernel:
    """Whole-block Pallas megakernel (`ops/pallas/dit_block.py`,
    block_kernel="mega"): one VMEM residency for modulation + cosine
    attention + MLP + both MP residuals (VERDICT r02 item #1)."""

    def test_kernel_vs_reference_math(self):
        from mapdit_tpu.ops.pallas.dit_block import _reference, fused_dit_block

        rng = np.random.default_rng(0)
        n, t, d, heads, h = 4, 16, 64, 2, 256
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        x, a = f(n, t, d), f(n, d)
        gains = jnp.asarray([0.3, 0.7], jnp.float32)
        args = (x, a, gains, f(6 * d, d), f(3 * d, d), f(d, d), f(h, d), f(d, h))
        got = fused_dit_block(*args, heads)
        ref = _reference(*args, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_full_model_parity_golden(self, golden):
        """DiT-XS/2 forward with block_kernel=mega (interpret on CPU) must
        match the reference golden like the unfused path does."""
        from mapdit_tpu.models import DiT, build_config
        from mapdit_tpu.utils.torch_import import variables_from_torch_state_dict

        g = golden("dit_xs2")
        sd = {k[len("sd.") :]: v for k, v in g.items() if k.startswith("sd.")}
        variables = variables_from_torch_state_dict(sd)
        cfg = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
            block_kernel="mega",
        )
        out = DiT(cfg).apply(
            variables, jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(g["y"])
        )
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=2e-4, atol=2e-4)

    def test_mega_vs_unfused_model_and_folded(self):
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 321.0)
        y = jnp.ones((2,), jnp.int32)
        a = DiT(base).apply(variables, x, t, y)
        b = DiT(base.replace(block_kernel="mega")).apply(variables, x, t, y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

        # the sampling configuration: folded weights skip in-kernel renorm
        from mapdit_tpu.runtime import fold_weights_for_inference

        fcfg = base.replace(block_kernel="mega", fold_weights=True)
        fv = dict(variables, params=fold_weights_for_inference(variables["params"], fcfg))
        c = DiT(fcfg).apply(fv, x, t, y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-3)

    def test_mega_gradients_match(self):
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 100.0)
        y = jnp.ones((2,), jnp.int32)

        def loss(cfg):
            def f(params):
                out = DiT(cfg).apply(
                    {"params": params, "constants": variables["constants"]}, x, t, y
                )
                return jnp.sum(out**2)

            return jax.grad(f)(variables["params"])

        ga = loss(base)
        gb = loss(base.replace(block_kernel="mega"))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            ga,
            gb,
        )

    @pytest.mark.parametrize("pack", ["1", "0"])
    def test_pack_mode_parity(self, pack, monkeypatch):
        """The paired-sample attention core (two samples merged along the
        token axis per contraction, cross-sample quadrants masked; ON by
        default since r03s4) and the MAPDIT_MEGA_PACK=0 unpacked core must
        be numerically the same block — both kernels, and both a
        pack-engaging shape (g even, 2T<=128) and the odd-g fallback."""
        from mapdit_tpu.ops.pallas import dit_block as dbk

        monkeypatch.setenv("MAPDIT_MEGA_PACK", pack)
        rng = np.random.default_rng(7)
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)

        for n in (4, 3):  # n=4 -> g=4 (pack engages); n=3 -> g=1 (fallback)
            t, d, heads, h = 16, 64, 2, 256
            x, a = f(n, t, d), f(n, d)
            gains = jnp.asarray([0.3, 0.7], jnp.float32)
            args = (x, a, gains, f(6 * d, d), f(3 * d, d), f(d, d),
                    f(h, d), f(d, h))
            got = dbk.fused_dit_block(*args, heads)
            ref = dbk._reference(*args, heads)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )
            attn_args = (x, f(n, d), f(n, d), f(n, d),
                         jnp.asarray(0.4, jnp.float32), f(3 * d, d), f(d, d))
            got = dbk.fused_attn_branch(*attn_args, heads)
            ref = dbk._attn_reference(*attn_args, heads)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )

    def test_stack_auto_promotion_gate(self, monkeypatch):
        """blocks._stack_auto_ok: promotes at S-class (any measured batch),
        never at B-scale (mega_attn wins there), never without a batch
        hint, never past the resident-stream VMEM fit."""
        from mapdit_tpu.models import blocks, build_config

        monkeypatch.setattr(blocks, "_mega_auto_ok", lambda: True)
        s = build_config(
            "DiT-S/2", in_channels=4, input_size=16, num_classes=10,
            compute_dtype="bfloat16", block_kernel="auto", fold_weights=True,
        )
        assert blocks._stack_auto_ok(s, 1)
        assert blocks._stack_auto_ok(s, 32)
        assert not blocks._stack_auto_ok(s, None)
        assert not blocks._stack_auto_ok(s, 100_000)  # stream > VMEM fit
        assert not blocks._stack_auto_ok(s.replace(scan_blocks=True), 32)
        assert not blocks._stack_auto_ok(s.replace(fold_weights=False), 32)
        b = build_config(
            "DiT-B/2", in_channels=4, input_size=16, num_classes=10,
            compute_dtype="bfloat16", block_kernel="auto", fold_weights=True,
        )
        assert not blocks._stack_auto_ok(b, 32)  # B: whole-block > budget
        # off-TPU (the real env for this suite): never promotes —
        # EXCEPT inside a shard_map body, where every shard is one device
        # and the caller passes single_device_ok (it has already
        # established the platform)
        monkeypatch.setattr(blocks, "_mega_auto_ok", lambda: False)
        assert not blocks._stack_auto_ok(s, 32)
        assert blocks._stack_auto_ok(s, 32, single_device_ok=True)

    def test_small_m_fallback_normalize_parity(self, monkeypatch):
        """The gemm_reduce geometry gate's FALLBACK branch (XL's G=2
        shapes: per-head VPU norm reduce, logits-fold applied) must match
        the reference — the default test shapes all satisfy the gate, so
        force it off."""
        from mapdit_tpu.ops.pallas import dit_block as dbk

        monkeypatch.setattr(dbk, "_gemm_reduce_pays", lambda rows, d: False)
        rng = np.random.default_rng(11)
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        n, t, d, heads, h = 4, 16, 64, 2, 256
        x, a = f(n, t, d), f(n, d)
        gains = jnp.asarray([0.3, 0.7], jnp.float32)
        args = (x, a, gains, f(6 * d, d), f(3 * d, d), f(d, d),
                f(h, d), f(d, h))
        got = dbk.fused_dit_block(*args, heads)
        ref = dbk._reference(*args, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    @pytest.mark.parametrize(
        "skip", ["norm", "softmax", "attn-core", "attn", "mlp", "mod"]
    )
    def test_mega_skip_probe_variants_run(self, skip, monkeypatch):
        """MAPDIT_MEGA_SKIP (tools/kernel_ablation.py timing probe) traces
        and runs for every stage variant, yields finite output, and actually
        changes the result (proving the stage was elided); unset must stay
        bit-identical to the default program."""
        from mapdit_tpu.ops.pallas import dit_block as dbk

        rng = np.random.default_rng(11)
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        t, d, heads, h = 16, 64, 2, 256
        x, a = f(8, t, d), f(8, d)
        gains = jnp.asarray([0.3, 0.7], jnp.float32)
        args = (x, a, gains, f(6 * d, d), f(3 * d, d), f(d, d),
                f(h, d), f(d, h))

        base = np.asarray(dbk.fused_dit_block(*args, heads))
        monkeypatch.setenv("MAPDIT_MEGA_SKIP", skip)
        got = np.asarray(dbk.fused_dit_block(*args, heads))
        assert np.isfinite(got).all()
        assert not np.allclose(got, base, atol=1e-5), skip
        monkeypatch.delenv("MAPDIT_MEGA_SKIP")
        again = np.asarray(dbk.fused_dit_block(*args, heads))
        np.testing.assert_array_equal(again, base)

    def test_attn_halfkernel_vs_reference_math(self):
        from mapdit_tpu.ops.pallas.dit_block import (
            _attn_reference,
            fused_attn_branch,
        )

        rng = np.random.default_rng(1)
        n, t, d, heads = 4, 16, 64, 2
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        args = (f(n, t, d), f(n, d), f(n, d), f(n, d),
                jnp.asarray(0.4, jnp.float32), f(3 * d, d), f(d, d))
        got = fused_attn_branch(*args, heads)
        ref = _attn_reference(*args, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_attn_res_fwd_matches_plain_fwd(self):
        """The residual-emitting forward kernel must produce the same primal
        output as the residual-free forward, and its saved residuals must
        match the reference softmax probabilities / pre-projection
        attention (the quantities the XLA backward consumes)."""
        from mapdit_tpu.ops.pallas import dit_block

        rng = np.random.default_rng(3)
        n, t, d, heads = 4, 16, 64, 2
        hd = d // heads
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        args = (f(n, t, d), f(n, d), f(n, d), f(n, d),
                jnp.asarray(0.4, jnp.float32), f(3 * d, d), f(d, d))
        y_plain = dit_block._attn_fwd_impl(*args, heads)
        y_res, p, attn = dit_block._attn_res_fwd_impl(*args, heads)
        np.testing.assert_allclose(
            np.asarray(y_res), np.asarray(y_plain), rtol=2e-5, atol=2e-5
        )
        assert p.shape == (n, heads, t, t) and p.dtype == jnp.float32
        assert attn.shape == (n, t, d)
        # rows of p are probability distributions
        np.testing.assert_allclose(
            np.asarray(jnp.sum(p, -1)), np.ones((n, heads, t)), atol=1e-5
        )
        # reference p/attn from the plain jnp math
        from mapdit_tpu.ops.mp import normalize

        x, shift, scale, gate, gain, w_qkv, w_out = args
        denom = jnp.sqrt((1 - gain) ** 2 + gain**2)
        u = x * scale[:, None, :]
        h = (u + (shift[:, None, :] - u) * gain) / denom
        qkv = h @ w_qkv.T / np.sqrt(d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        th = lambda z: z.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
        q, k, v = normalize(th(q)), normalize(th(k)), th(v)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd)
        p_ref = jax.nn.softmax(logits, axis=-1)
        attn_ref = jnp.einsum("nhqk,nhkd->nhqd", p_ref, v)
        attn_ref = attn_ref.transpose(0, 2, 1, 3).reshape(n, t, d)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_attn_halfkernel_model_parity(self):
        """block_kernel=mega_attn (B-scale variant): full-model output
        matches the unfused path."""
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 321.0)
        y = jnp.ones((2,), jnp.int32)
        a = DiT(base).apply(variables, x, t, y)
        b = DiT(base.replace(block_kernel="mega_attn")).apply(variables, x, t, y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("variant", ["dw_in_kernel", "streaming", "residual"])
    def test_attn_halfkernel_pallas_bwd_matches_reference(self, variant, monkeypatch):
        """The hand-written backward paths (`_attn_bwd_dw_kernel` for
        S-class D, `_attn_bwd_kernel` streaming for B/XL, and the
        residual-emitting forward + pure-XLA backward of
        ``attn_bwd="residual"``) must produce the same cotangents as
        differentiating the jnp reference — for ALL seven inputs
        (x, shift, scale, gate, gain, w_qkv, w_out). n=6 forces g=2 with a
        3-step grid, exercising the cross-grid accumulation of the
        modulation/gain/dW grads (and, for "residual", the blocked p/attn
        residual outputs)."""
        from mapdit_tpu.ops.pallas import dit_block

        if variant == "dw_in_kernel":
            # off by default (measured slower on chip); force it here so the
            # escape hatch stays gradient-correct
            monkeypatch.setattr(dit_block, "_DW_IN_KERNEL_BUDGET", 5 * 2**20)

        rng = np.random.default_rng(7)
        n, t, d, heads = 6, 16, 64, 2
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        args = (f(n, t, d), f(n, d), f(n, d), f(n, d),
                jnp.asarray(0.37, jnp.float32), f(3 * d, d), f(d, d))
        cot = f(n, t, d)

        def loss(bwd):
            return lambda *a: jnp.sum(
                dit_block.fused_attn_branch(*a, heads, bwd=bwd) * cot
            )

        argnums = tuple(range(7))
        bwd_name = "residual" if variant == "residual" else "pallas"
        gp = jax.grad(loss(bwd_name), argnums=argnums)(*args)
        gr = jax.grad(loss("reference"), argnums=argnums)(*args)
        for name, a, b in zip(
            ("x", "shift", "scale", "gate", "gain", "w_qkv", "w_out"), gp, gr
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=f"cotangent mismatch for {name}",
            )

    @pytest.mark.parametrize("attn_bwd", ["pallas", "residual"])
    def test_attn_halfkernel_model_gradients_match(self, attn_bwd):
        """Full-model training gradients through block_kernel=mega_attn
        match the unfused path — for both the fused Pallas backward and the
        residual-emitting forward + XLA backward (``attn_bwd="residual"``)."""
        from mapdit_tpu.models import DiT, build_config, init_model

        base = build_config("DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                            block_kernel="off")
        _, variables = init_model(base, seed=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 100.0)
        y = jnp.ones((2,), jnp.int32)

        def loss(cfg):
            def f(params):
                out = DiT(cfg).apply(
                    {"params": params, "constants": variables["constants"]}, x, t, y
                )
                return jnp.sum(out**2)

            return jax.grad(f)(variables["params"])

        ga = loss(base)
        gb = loss(base.replace(block_kernel="mega_attn", attn_bwd=attn_bwd))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            ga,
            gb,
        )

    def test_auto_dispatch_budgets(self):
        """The auto policy's VMEM arithmetic: whole-block kernel fits S and
        below; the attention half fits B outright and XL under its
        group-shrinking budget — per the chip A/B data in BENCH_NOTES r03."""
        from mapdit_tpu.models import build_config
        from mapdit_tpu.models.blocks import (
            _ATTN_WEIGHT_BUDGET,
            _VMEM_WEIGHT_BUDGET,
            _attn_weight_bytes,
            _whole_block_weight_bytes,
        )

        mk = lambda name: build_config(
            name, in_channels=4, input_size=16, num_classes=1000,
            compute_dtype="bfloat16",
        )
        s, b, xl = mk("DiT-S/2"), mk("DiT-B/2"), mk("DiT-XL/2")
        assert _whole_block_weight_bytes(s) <= _VMEM_WEIGHT_BUDGET
        assert _whole_block_weight_bytes(b) > _VMEM_WEIGHT_BUDGET
        assert _attn_weight_bytes(b) <= _ATTN_WEIGHT_BUDGET
        assert _attn_weight_bytes(xl) <= _ATTN_WEIGHT_BUDGET
        assert _whole_block_weight_bytes(xl) > _VMEM_WEIGHT_BUDGET

    def test_mega_gate_requires_mp_adaln_family(self):
        """Vanilla / rotation configs must not dispatch to the megakernel."""
        from mapdit_tpu.models import DiT, build_config, init_model

        for override in (
            {"modulation": "rotation"},
            {"use_no_layernorm": False},
            {"use_cosine_attention": False},
        ):
            cfg = build_config(
                "DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
                block_kernel="mega", **override,
            )
            _, variables = init_model(cfg, seed=1)
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
            out = DiT(cfg).apply(
                variables, x, jnp.full((2,), 5.0), jnp.ones((2,), jnp.int32)
            )
            assert np.isfinite(np.asarray(out)).all()


class TestDiTStackMegakernel:
    """Whole-STACK Pallas megakernel (`fused_dit_stack`,
    block_kernel="mega_stack"): all depth blocks in ONE pallas_call —
    residual stream resident in VMEM scratch across the stack, per-block
    weights streamed via block-indexed BlockSpecs."""

    def _stack_args(self, n, depth=3, t=16, d=64, heads=2, h=256, seed=0):
        rng = np.random.default_rng(seed)
        f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        gains = jnp.asarray(rng.normal(size=(depth, 2)) * 0.3, jnp.float32)
        return (
            f(n, t, d), f(n, d), gains,
            f(depth, 6 * d, d), f(depth, 3 * d, d), f(depth, d, d),
            f(depth, h, d), f(depth, d, h),
        ), heads

    @pytest.mark.parametrize("n", [4, 3])  # g=4 grid + the odd-n g=1 fallback
    def test_stack_kernel_vs_reference_math(self, n):
        from mapdit_tpu.ops.pallas.dit_block import (
            _stack_reference,
            fused_dit_stack,
        )

        args, heads = self._stack_args(n)
        got = fused_dit_stack(*args, heads)
        ref = _stack_reference(*args, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_stack_equals_per_block_kernel(self):
        """The stack kernel must be the same math as depth sequential
        single-block megakernel calls."""
        from mapdit_tpu.ops.pallas.dit_block import (
            fused_dit_block,
            fused_dit_stack,
        )

        args, heads = self._stack_args(4, seed=5)
        x, a, gains = args[:3]
        stacked = args[3:]
        got = fused_dit_stack(*args, heads)
        step = x
        for b in range(gains.shape[0]):
            step = fused_dit_block(
                step, a, gains[b], *[w[b] for w in stacked], heads
            )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(step), rtol=2e-4, atol=2e-4
        )

    def test_model_apply_with_block_stack_matches(self):
        """DiT.apply(block_stack=...) (what the sampling runtime passes)
        must match the plain per-block forward on folded weights."""
        from mapdit_tpu.models import DiT, build_config, init_model
        from mapdit_tpu.runtime import (
            build_block_stack,
            fold_weights_for_inference,
        )

        base = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10
        )
        _, variables = init_model(base, seed=3)
        fcfg = base.replace(fold_weights=True, block_kernel="mega_stack")
        fv = dict(
            variables,
            params=fold_weights_for_inference(variables["params"], fcfg),
        )
        stack = build_block_stack(fv["params"], fcfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 16, 16))
        t = jnp.full((4,), 321.0)
        y = jnp.ones((4,), jnp.int32)
        a = DiT(fcfg).apply(fv, x, t, y)
        b = DiT(fcfg).apply(fv, x, t, y, block_stack=stack)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )

    def test_runtime_chain_parity(self):
        """build_sample_fn(block_kernel="mega_stack") reproduces the plain
        chain across the CFG, cond-only, cfg-interval and dpm++ paths."""
        from mapdit_tpu.diffusion import create_diffusion, respacing_string
        from mapdit_tpu.models import build_config, init_model
        from mapdit_tpu.runtime import build_sample_fn

        base = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10
        )
        _, variables = init_model(base, seed=3)
        stack_cfg = base.replace(block_kernel="mega_stack")
        d8 = create_diffusion("8")
        noise = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 16, 16))
        y = jnp.concatenate(
            [jnp.array([1, 2]), jnp.full((2,), 10)]
        ).astype(jnp.int32)
        rng = jax.random.PRNGKey(7)

        cases = [
            (d8, dict(cfg_scale=4.0), y),
            (d8, dict(), (y % 10)),
            (d8, dict(cfg_scale=4.0, cfg_interval=(0.3, 3.0)), y),
            (
                create_diffusion(respacing_string(8, "dpm++", "karras")),
                dict(cfg_scale=4.0, sampler="dpm++"),
                y,
            ),
        ]
        for diff, kw, yy in cases:
            a = np.asarray(
                build_sample_fn(
                    base, variables, diff, clip_denoised=True, **kw
                )(noise, yy, rng)
            )
            b = np.asarray(
                build_sample_fn(
                    stack_cfg, variables, diff, clip_denoised=True, **kw
                )(noise, yy, rng)
            )
            assert np.isfinite(a).all() and np.isfinite(b).all(), kw
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_stack_rejects_oversize_working_set(self, monkeypatch):
        """XL-class weight stacks (45.6 MB bf16, double-buffered) cannot fit
        the 96 MB VMEM scope cap — the impl must fail with a diagnosis, not
        Mosaic's VMEM-OOM compile error. (_interpret is patched False so the
        compile-path guard runs; the raise fires before pallas_call.)"""
        from mapdit_tpu.ops.pallas import dit_block

        monkeypatch.setattr(dit_block, "_interpret", lambda: False)
        d, h, depth, heads = 1152, 4608, 2, 16
        args, _ = self._stack_args(8, depth=depth, t=64, d=d, h=h)
        with pytest.raises(ValueError, match="mega_attn"):
            jax.eval_shape(
                lambda *a: dit_block.fused_dit_stack(*a, heads), *args
            )

    def test_stack_scope_self_sizes(self, monkeypatch):
        """The scope arithmetic: S-class needs the 32 MB floor, B-class
        sizes to its working set, and the 8 MB headroom in `need_mb`
        guarantees the feasibility guard passes whenever the cap isn't hit."""
        for d, h, n, t in [(384, 1536, 64, 64), (768, 3072, 128, 64)]:
            wb = (10 * d * d + 2 * d * h) * 2
            scratch = n * t * d * 2
            need = -(-(3 * 2**20 + 2 * wb + scratch + 5 * 2**20) // 2**20)
            scope = max(32, min(96, need))
            assert 2 * wb + scratch <= (scope - 8) * 2**20, (d, scope)

    def test_stack_rejects_span_cache(self):
        from mapdit_tpu.diffusion import create_diffusion
        from mapdit_tpu.models import build_config, init_model
        from mapdit_tpu.runtime import build_cached_sample_fn

        cfg = build_config(
            "DiT-XS/2", in_channels=4, input_size=16, num_classes=10,
            block_kernel="mega_stack",
        )
        _, variables = init_model(cfg, seed=0)
        with pytest.raises(AssertionError, match="mega"):
            build_cached_sample_fn(
                cfg, variables, create_diffusion("8"), cache_interval=2
            )
