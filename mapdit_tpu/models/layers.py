"""Basic layers: MP linear / embedding, attention, MLP (flax.linen).

Functional re-expression of the reference's `src/basic/` and `src/layers/`:

* The reference's **forced weight normalization** mutates parameters inside
  ``forward`` under ``no_grad`` every training step (`src/basic/mp_linear.py:38-40`).
  That is impossible (and undesirable) in a functional JAX model; the
  equivalent fixed point is achieved by projecting the stored weights after
  each optimizer update — see :func:`mapdit_tpu.models.dit.project_weights`
  and SURVEY.md §2.2. The in-graph "traditional" weight normalization
  (`mp_linear.py:44`) is reproduced here exactly, so the *forward math* is
  identical regardless of whether stored weights are normalized.

* Weights keep the reference's ``(out_dim, in_dim)`` layout and ``weight``
  name so torch checkpoints map across mechanically
  (`mapdit_tpu.utils.torch_import`). XLA canonicalizes the transpose; layout
  on TPU is the compiler's job, not the module author's.

* Flags-off path is vanilla DiT: standard Dense (xavier init + bias),
  plain SiLU, non-cosine attention (Peebles & Xie 2023).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.ops.attention import dot_product_attention
from mapdit_tpu.ops.mp import mp_silu, normalize

Array = jax.Array


class MPLinear(nn.Module):
    """Bias-free weight-normalized linear (reference `src/basic/mp_linear.py:9-46`).

    With ``use_wn=False`` this degrades to a standard Dense with bias and
    xavier-uniform init (``zero_init`` zeroes the kernel — adaLN-Zero heads).
    """

    in_dim: int
    out_dim: int
    use_wn: bool = True
    zero_init: bool = False
    learn_gain: bool = False
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    def setup(self):
        # setup-style (not @compact) so effective_weight() can hand raw
        # weights to fused kernels while this module owns the parameter.
        if self.use_wn:
            self.weight = self.param(
                "weight", nn.initializers.normal(1.0), (self.out_dim, self.in_dim)
            )
            if self.learn_gain:
                self.gain = self.param(
                    "gain",
                    nn.initializers.constant(0.0 if self.zero_init else 1.0),
                    (),
                )
        else:
            init = (
                nn.initializers.zeros
                if self.zero_init
                else nn.initializers.xavier_uniform()
            )
            self.weight = self.param("weight", init, (self.out_dim, self.in_dim))
            self.bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))

    def __call__(self, x: Array) -> Array:
        if self.use_wn:
            w = self.weight
            gain = self.gain if self.learn_gain else 1.0
            if not self.folded:
                w = normalize(w)
            w = w * (gain / math.sqrt(self.in_dim))
            return x.astype(self.dtype) @ w.T.astype(self.dtype)
        return (
            x.astype(self.dtype) @ self.weight.T.astype(self.dtype)
            + self.bias.astype(self.dtype)
        )

    def effective_weight(self) -> Array:
        """The (out, in) matrix actually multiplied against inputs — for
        fused kernels that consume raw weights while this module keeps
        owning the parameter (WN mode only). Excludes the 1/sqrt(in_dim)
        factor, which callers fold as a scalar into their epilogue."""
        assert self.use_wn and not self.learn_gain
        w = self.weight
        if not self.folded:
            w = normalize(w)
        return w


class MPLinearSplit(nn.Module):
    """Fused multi-head linear returning a tuple of output chunks.

    Generalizes the reference's ``MPLinearChunk`` (`src/basic/mp_linear.py:48-75`)
    to uneven chunk sizes (needed by rotation modulation, whose heads emit
    D/2 angles next to D-sized gates). The reference's ``chunk_normalize`` is
    row-wise normalization, identical for any chunking (see
    `mapdit_tpu/ops/mp.py:normalize`), so one weight matrix of concatenated
    rows reproduces it exactly.
    """

    in_dim: int
    out_dims: Tuple[int, ...]
    use_wn: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    def setup(self):
        # setup-style (not @compact) so effective_weight() can hand the raw
        # fused matrix to fused kernels while this module owns the parameter
        total = sum(self.out_dims)
        if self.use_wn:
            self.weight = self.param(
                "weight", nn.initializers.normal(1.0), (total, self.in_dim)
            )
        else:
            init = (
                nn.initializers.zeros
                if self.zero_init
                else nn.initializers.xavier_uniform()
            )
            self.weight = self.param("weight", init, (total, self.in_dim))
            self.bias = self.param("bias", nn.initializers.zeros, (total,))

    def __call__(self, x: Array) -> Tuple[Array, ...]:
        if self.use_wn:
            w = self.weight
            if not self.folded:
                w = normalize(w)
            w = w / math.sqrt(self.in_dim)
            out = x.astype(self.dtype) @ w.T.astype(self.dtype)
        else:
            out = (
                x.astype(self.dtype) @ self.weight.T.astype(self.dtype)
                + self.bias.astype(self.dtype)
            )

        splits, start = [], 0
        for d in self.out_dims:
            splits.append(out[..., start : start + d])
            start += d
        return tuple(splits)

    def effective_weight(self) -> Array:
        """The fused (sum(out_dims), in) matrix actually multiplied against
        inputs, excluding the 1/sqrt(in_dim) scalar (WN mode only)."""
        assert self.use_wn
        w = self.weight
        if not self.folded:
            w = normalize(w)
        return w


class MPEmbedding(nn.Module):
    """Weight-normalized embedding (reference `src/basic/mp_embedding.py:8-24`).

    Vanilla mode: standard embedding table with N(0, 0.02) init (DiT paper).
    """

    num_embeddings: int
    embedding_dim: int
    use_wn: bool = True
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, idx: Array) -> Array:
        if self.use_wn:
            w = self.param(
                "weight",
                nn.initializers.normal(1.0),
                (self.num_embeddings, self.embedding_dim),
            )
            if not self.folded:
                w = normalize(w)
        else:
            w = self.param(
                "weight",
                nn.initializers.normal(0.02),
                (self.num_embeddings, self.embedding_dim),
            )
        return jnp.take(w.astype(self.dtype), idx, axis=0)


def activation(x: Array, cfg: DiTConfig) -> Array:
    return mp_silu(x) if cfg.use_mp_silu else jax.nn.silu(x)


class Attention(nn.Module):
    """Multi-head (cosine) attention (reference `src/layers/attention.py:9-51`).

    Fused QKV projection, optional q/k row normalization (cosine attention),
    explicit ``1/sqrt(head_dim)`` scale, bias-free output projection. No
    dropout, no mask (parity with the reference).
    """

    cfg: DiTConfig
    in_dim: int

    def setup(self):
        c = self.cfg
        self.qkv_proj = MPLinearSplit(
            self.in_dim,
            (self.in_dim,) * 3,
            use_wn=c.use_weight_normalization,
            folded=c.fold_weights,
            dtype=c.dtype,
        )
        self.out_proj = MPLinear(
            self.in_dim,
            self.in_dim,
            use_wn=c.use_weight_normalization,
            folded=c.fold_weights,
            dtype=c.dtype,
        )

    def __call__(self, x: Array) -> Array:
        c = self.cfg
        h = c.num_heads
        hd = self.in_dim // h
        b, t, _ = x.shape

        q, k, v = self.qkv_proj(x)

        def to_heads(z):
            return z.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(
            to_heads(q),
            to_heads(k),
            to_heads(v),
            scale=1.0 / math.sqrt(hd),
            cosine=c.use_cosine_attention,
            impl=c.attention_impl,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.in_dim)
        return self.out_proj(out)


class MLP(nn.Module):
    """fc1 -> (MP)SiLU -> fc2 (reference `src/layers/mlp.py:7-25`)."""

    cfg: DiTConfig
    in_dim: int
    out_dim: int
    hidden_dim: Optional[int] = None
    mlp_ratio: float = 4.0

    def setup(self):
        c = self.cfg
        hidden = (
            int(self.in_dim * self.mlp_ratio)
            if self.hidden_dim is None
            else self.hidden_dim
        )
        self.fc1 = MPLinear(
            self.in_dim, hidden, use_wn=c.use_weight_normalization,
            folded=c.fold_weights, dtype=c.dtype,
        )
        self.fc2 = MPLinear(
            hidden, self.out_dim, use_wn=c.use_weight_normalization,
            folded=c.fold_weights, dtype=c.dtype,
        )

    def __call__(self, x: Array) -> Array:
        return self.fc2(activation(self.fc1(x), self.cfg))

    def fused_branch(self, x: Array, shift: Array, scale: Array, gate: Array, gain) -> Array:
        """Whole MP-MLP half-block (modulate -> MLP -> gate -> mp_sum
        residual) through the fused Pallas kernel
        (`mapdit_tpu.ops.pallas.mlp_block`). MP+adaln family only."""
        from mapdit_tpu.ops.pallas.mlp_block import fused_mlp_branch

        c = self.cfg
        w1 = self.fc1.effective_weight().astype(c.dtype)
        w2 = self.fc2.effective_weight().astype(c.dtype)
        return fused_mlp_branch(
            x, shift.astype(x.dtype), scale.astype(x.dtype), gate.astype(x.dtype),
            jnp.asarray(gain, jnp.float32), w1, w2,
        )
