"""Reusable compute ops: the TPU-native analog of the reference's ``src/modules/``.

Everything here is either a pure function over jnp arrays (explicit PRNG keys,
no hidden state) or a small flax NNX module. Hot paths have Pallas TPU kernels
behind dispatch functions with XLA fallbacks for CPU/interpret testing.
"""

from . import norm, patch, rope
from .attention import dot_product_attention

__all__ = ["norm", "patch", "rope", "dot_product_attention"]
