"""vision-pt-tpu: TPU-native training + inference framework for image diffusion
and rectified-flow models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of p1atdev/vision-pt
(PyTorch/CUDA), designed TPU-first:

- models are flax NNX modules compiled with ``jax.jit`` (one executable per
  aspect-ratio-bucket shape),
- hot kernels (flash attention, NF4 dequant-matmul, fused AdaLN) are Pallas
  TPU kernels with XLA fallbacks,
- parallelism is ``jax.sharding.Mesh`` + NamedSharding (DP / FSDP / TP) with
  collectives over ICI, not a DDP wrapper,
- randomness is explicit ``jax.random`` key threading.
"""

__version__ = "0.1.0"
