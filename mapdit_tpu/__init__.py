"""mapdit-tpu: a TPU-native JAX/Flax/Pallas rebuild of MaP-DiT.

Magnitude-preserving Diffusion Transformers (arXiv 2505.19122) re-architected
for TPU: functional Flax model with explicit weight-projection instead of
in-forward parameter mutation, device-resident diffusion coefficient tables,
`jax.lax.scan` denoising loops, data/tensor-parallel training over a
`jax.sharding.Mesh`, and Pallas kernels for the fused hot ops.

Reference behavior map: see SURVEY.md (reference @ /root/reference,
ericbill21/map-dit).
"""

__version__ = "0.1.0"
