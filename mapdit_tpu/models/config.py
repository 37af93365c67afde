"""Model configuration: the `--use-*` MaP feature flags as real switches.

The reference README (`README.md:57-66`) documents eight `--use-*` flags that
do not exist in the snapshot's argparse (`train.py:225-248`) — the MP design
is hardwired on everywhere (SURVEY.md fact #1). Here they are first-class
config switches. All flags default ON (reference behavior); all flags OFF
with ``modulation="adaln"`` yields a vanilla DiT (LayerNorm + adaLN-Zero +
standard Linear/SiLU, per Peebles & Xie 2023).

``modulation`` selects the conditioning mechanism (SURVEY.md fact #2 —
rotation modulation has no reference code; implemented from the paper,
arXiv 2505.19122):
  * ``adaln``          — shift/scale/gate (MP-style modulate when the MP flags
                         are on, classic ``x*(1+scale)+shift`` when off)
  * ``rotation``       — learned pairwise Givens rotation + gate
  * ``rotation_scale`` — rotation composed with scaling + gate (the paper's
                         "~5.4% fewer parameters" variant)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

MODULATION_KINDS = ("adaln", "rotation", "rotation_scale")


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    # Architecture (reference `src/dit.py:15-27`)
    depth: int
    hidden_size: int
    patch_size: int
    num_heads: int
    input_size: int = 32
    in_channels: int = 3
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True

    # --use-* MaP flags (reference README.md:57-66; hardwired on in the code)
    use_cosine_attention: bool = True
    use_weight_normalization: bool = True
    use_forced_weight_normalization: bool = True
    use_mp_residual: bool = True
    use_mp_silu: bool = True
    use_no_layernorm: bool = True
    use_mp_pos_enc: bool = True
    use_mp_embedding: bool = True

    # Conditioning mechanism selector (paper ablation; "adaln" = reference)
    modulation: str = "adaln"

    # TPU execution knobs (no reference equivalent)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas[_v2|_v3]"
    # Block-fusion Pallas kernels:
    #   "mega"   — whole-DiT-block megakernel (ops/pallas/dit_block.py):
    #              both modulations + cosine attention + MLP + MP residuals
    #              in one VMEM residency. The r03 trace showed 30% of the
    #              S/2 chain was HBM head-relayout copies + 17% separate
    #              normalize passes; this kernel eliminates both (A/B'd on
    #              chip, docs/BENCH_NOTES.md). MP+adaln family only;
    #              interpret mode off-TPU.
    #   "mega_attn" — attention half-block only (modulate+qkv+cosine attn+
    #              out-proj+residual in VMEM; modulation head and MLP on
    #              XLA) — the B-scale variant whose 4D^2 weights still fit.
    #   "mega_stack" — ALL depth blocks in ONE pallas_call (runtime-only:
    #              build_shared_sample_fn stacks the folded weights at
    #              prepare() time and passes them via DiT(block_stack=...));
    #              residual stream stays VMEM-resident across the stack,
    #              per-block weights stream behind compute. Outside the
    #              sampling runtime this value runs the XLA pipeline.
    #   "mega_attn_tp" — tensor-parallel attention half-block: head-sharded
    #              Pallas kernel inside a shard_map island over the mesh's
    #              'model' axis (one psum per block). Runtime-only, set by
    #              build_sample_fn(mesh=) when the TP latency layout can
    #              keep the kernels live; needs an ambient jax.set_mesh.
    #   "pallas" — fused MP-MLP half-block only (ops/pallas/mlp_block.py);
    #              measured ~2% BEHIND XLA at S/2 — kept as A/B infra.
    #   "auto"/"off" — XLA fusion pipeline.
    block_kernel: str = "off"
    # Backward implementation for the attention half-block kernel
    # (block_kernel="mega_attn" under grad — training only):
    #   "pallas"    — hand-written fused backward kernel: flash-style forward
    #                 recompute + the full VJP in one VMEM residency
    #                 (ops/pallas/dit_block.py:_attn_bwd_kernel).
    #   "residual"  — Pallas forward that additionally emits the softmax
    #                 probabilities + pre-projection attention as residuals;
    #                 the backward is plain XLA consuming them (no forward
    #                 recompute anywhere).
    #   "reference" — recompute through the plain jnp ops and let XLA
    #                 differentiate (r02 behavior; escape hatch).
    attn_bwd: str = "pallas"
    # Activation rematerialization per block (jax.checkpoint) — trades
    # backward-pass FLOPs for memory on deep models (XL: 28 blocks). The
    # reference has only a vestigial hook for this (`src/dit.py:64-68`).
    remat: bool = False
    # Compile one block and lax.scan over depth-stacked params instead of
    # unrolling `depth` blocks — ~depth-fold smaller XLA graph/compile time
    # (essential for DiT-XL through slow compile paths). Params for the
    # blocks live stacked with a leading (depth,) axis; converters in
    # models/dit.py.
    scan_blocks: bool = False
    # Inference: weights pre-normalized once (fold_weights_for_inference),
    # skip the in-graph re-normalization inside the sampling scan. The
    # in-graph WN is idempotent up to its 1e-4 eps, so this changes results
    # by O(1e-5) relative while removing a full param renorm per denoise
    # step. Training must keep this False.
    fold_weights: bool = False

    def __post_init__(self):
        assert self.hidden_size % self.num_heads == 0
        assert self.hidden_size % 2 == 0, "rotation modulation needs even width"
        assert self.modulation in MODULATION_KINDS, self.modulation
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.attention_impl in ("auto", "xla", "pallas", "pallas_v2", "pallas_v3")
        assert self.block_kernel in (
            "auto", "pallas", "mega", "mega_attn", "mega_attn_tp",
            "mega_tp", "mega_stack", "off",
        )
        assert self.attn_bwd in ("pallas", "residual", "reference")

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def mp_style(self) -> bool:
        """MP-family conditioning arithmetic vs classic adaLN-Zero arithmetic.

        Keyed on use_no_layernorm: the classic ``x*(1+scale)+shift`` pairs
        with pre-modulation LayerNorm (vanilla DiT), while the MP
        ``mp_sum(x*scale, shift, gain)`` form assumes unit-magnitude
        activations maintained by the MP machinery.
        """
        return self.use_no_layernorm

    def replace(self, **kw) -> "DiTConfig":
        return dataclasses.replace(self, **kw)

    def flags_dict(self) -> dict:
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name.startswith("use_") or f.name == "modulation"
        }
