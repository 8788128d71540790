"""Multi-axis rotary position embeddings (Flux-style).

TPU-native rebuild of the reference's ``src/modules/positional_encoding/rope.py``.
Frequencies are precomputed as (seq, head_dim//2, 2[cos,sin]) tables outside the
jitted step (they depend only on static shapes) and applied to q/k in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def image_position_indices(
    height: int,
    width: int,
    rope_axes: int = 3,
    y_index: int = 1,
    x_index: int = 2,
) -> np.ndarray:
    """(zero, y, x) position ids for an image token grid.

    Matches reference ``rope.py:5-33``: grid of (height//2, width//2) positions
    (the reference passes latent dims pre-doubled), flattened row-major.
    """
    pos = np.zeros((height // 2, width // 2, rope_axes), dtype=np.float32)
    pos[..., y_index] += np.arange(height // 2, dtype=np.float32)[:, None]
    pos[..., x_index] += np.arange(width // 2, dtype=np.float32)[None, :]
    return pos.reshape(-1, rope_axes)


def _axis_frequencies(pos: np.ndarray, dim: int, theta: float) -> np.ndarray:
    """cos/sin table for one position axis (reference ``rope.py:36-60``)."""
    assert dim % 2 == 0, "dim must be even"
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta**scale)
    angles = np.outer(pos.astype(np.float64), omega)  # (seq, dim//2)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def get_rope_frequencies(
    position_indices: np.ndarray,  # (seq, n_axes)
    dim_sizes: list[int],  # per-axis rotary dims, sum == head_dim
    theta: float = 10000.0,
) -> np.ndarray:
    """Concatenated per-axis cos/sin tables, shape (seq, sum(dims)//2, 2).

    Matches reference ``rope.py:63-82``.
    """
    assert len(dim_sizes) == position_indices.shape[-1]
    freqs = [
        _axis_frequencies(position_indices[..., i], dim, theta)
        for i, dim in enumerate(dim_sizes)
    ]
    return np.concatenate(freqs, axis=-2)


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) feature pairs by the given frequencies.

    Args:
        x: (..., seq, head_dim)
        freqs: (seq, head_dim//2, 2) with [..., 0]=cos, [..., 1]=sin,
            broadcastable against x's leading dims.

    Matches reference ``rope.py:85-120`` (fp32 compute, cast back).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    cos = freqs[..., 0]
    sin = freqs[..., 1]
    x_even = x32[..., 0::2]
    x_odd = x32[..., 1::2]
    rot_even = x_even * cos - x_odd * sin
    rot_odd = x_even * sin + x_odd * cos
    out = jnp.stack([rot_even, rot_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def apply_rope_qk(
    q: jax.Array, k: jax.Array, freqs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Apply the same rotary table to q and k (reference ``rope.py:114-133``)."""
    return apply_rope(q, freqs), apply_rope(k, freqs)


class RoPEFrequency:
    """Host-side frequency-table builder (reference ``rope.py:136-162``).

    Pure-Python/NumPy: tables depend only on static sequence geometry, so they
    are computed once per bucket shape on the host and passed into the jitted
    step as constants.
    """

    def __init__(self, dim_sizes: list[int], theta: float = 10000.0):
        self.dim_sizes = list(dim_sizes)
        self.theta = theta

    def get_image_position_indices(
        self, height: int, width: int, y_index: int = 1, x_index: int = 2
    ) -> np.ndarray:
        return image_position_indices(
            height, width, len(self.dim_sizes), y_index, x_index
        )

    def get_text_position_indices(self, seq_len: int) -> np.ndarray:
        return np.zeros((seq_len, len(self.dim_sizes)), dtype=np.float32)

    def __call__(self, position_indices: np.ndarray) -> jax.Array:
        return jnp.asarray(
            get_rope_frequencies(position_indices, self.dim_sizes, self.theta)
        )
