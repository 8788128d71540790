"""Array <-> PIL utilities (rebuild of reference ``src/utils/tensor.py``).

Images are NHWC float in [-1, 1] on the JAX side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def incremental_seed_randn(
    shape: tuple[int, ...],
    seed: int | None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Per-sample seeded noise: sample b uses seed+b (reference
    ``src/utils/tensor.py:11-36``), so a batch of seeds reproduces the same
    images as independent single generations."""
    batch = shape[0]
    if seed is None:
        seed = int(np.random.default_rng().integers(0, 2**31 - 1))
    keys = [jax.random.key(seed + i) for i in range(batch)]
    per_sample = [
        jax.random.normal(k, shape[1:], dtype=jnp.float32) for k in keys
    ]
    return jnp.stack(per_sample).astype(dtype)


def images_to_tensor(images: list[Image.Image]) -> jax.Array:
    """PIL RGB -> NHWC float32 in [-1, 1]."""
    arrs = [np.asarray(img.convert("RGB"), dtype=np.float32) / 127.5 - 1.0 for img in images]
    return jnp.asarray(np.stack(arrs))


def tensor_to_images(tensor: jax.Array) -> list[Image.Image]:
    """NHWC float in [-1, 1] -> list of PIL images (reference
    ``src/utils/tensor.py:91-106``)."""
    arr = np.asarray(tensor.astype(jnp.float32))
    arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return [Image.fromarray(a) for a in arr]


def nchw_to_nhwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
