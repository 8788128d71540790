"""Polar positional embedding (PoPE, arXiv 2509.10534) extension.

Rebuild of reference ``src/models/jit/extension/pope.py``. PoPE uses
softplus(x) as a complex magnitude rotated by per-dimension position phases
(full-dim frequencies, not paired), doubling the q/k head dim; a learned
per-head phase bias (clamped to +-pi) applies to K only. The normalized
variant rescales positions to a fixed span for resolution generalization.

Frequencies are computed at trace time from static shapes (angles directly —
equivalent to the reference's table+gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....ops.attention import dot_product_attention
from ..denoiser import Attention


def apply_pope(
    x: jax.Array,  # (B, S, H, D)
    freqs: jax.Array,  # (S, D, 2) cos/sin, full-dim angles
    learned_bias: jax.Array | None = None,  # (H, D) phase bias
) -> jax.Array:
    """softplus magnitude x rotation -> (B, S, H, 2*D)
    (reference ``pope.py:6-38``; complex interleave = (re, im) pairs)."""
    orig_dtype = x.dtype
    sp = jax.nn.softplus(x.astype(jnp.float32))
    cos = freqs[..., 0][None, :, None, :]  # (1, S, 1, D)
    sin = freqs[..., 1][None, :, None, :]
    if learned_bias is not None:
        b = learned_bias.astype(jnp.float32)[None, None, :, :]  # (1, 1, H, D)
        cos_b, sin_b = jnp.cos(b), jnp.sin(b)
        cos, sin = cos * cos_b - sin * sin_b, cos * sin_b + sin * cos_b
    re = sp * cos
    im = sp * sin
    out = jnp.stack([re, im], axis=-1).reshape(*x.shape[:-1], x.shape[-1] * 2)
    return out.astype(orig_dtype)


class PopeEmbedder:
    """Full-dim phase tables (reference ``pope.py:41-207``)."""

    def __init__(
        self,
        pope_theta: float = 256.0,
        axes_dims: tuple[int, ...] = (64, 128, 128),
        axes_lens: tuple[int, ...] = (256, 128, 128),
        zero_centered: tuple[bool, ...] = (False, True, True),
        do_normalize: tuple[bool, ...] = (False, True, True),
        normalize_by: float = 64.0,
    ):
        self.pope_theta = pope_theta
        self.axes_dims = tuple(axes_dims)
        self.axes_lens = tuple(axes_lens)
        self.zero_centered = tuple(zero_centered)
        self.do_normalize = tuple(do_normalize)
        self.normalize_by = normalize_by
        self.num_axes = len(axes_dims)

    def _omega(self, dim: int) -> np.ndarray:
        # PoPE uses full-dim frequencies (reference ``pope.py:75-81``)
        return 1.0 / (
            self.pope_theta ** (np.arange(0, dim, 1, dtype=np.float64) / dim)
        )

    def _axis_freqs(self, positions: np.ndarray, dim: int) -> np.ndarray:
        angles = np.outer(positions.astype(np.float64), self._omega(dim))
        return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(
            np.float32
        )

    def __call__(self, position_ids: np.ndarray) -> np.ndarray:
        parts = [
            self._axis_freqs(position_ids[..., i], dim)
            for i, dim in enumerate(self.axes_dims)
        ]
        return np.concatenate(parts, axis=-2)  # (seq, sum(dims), 2)

    def prepare_image_position_ids(
        self, height: int, width: int, patch_size: int, global_index: int
    ) -> np.ndarray:
        h = height // patch_size
        w = width // patch_size
        pos = np.zeros((h, w, self.num_axes), dtype=np.float32)
        pos[:, :, 0] = global_index
        pos[:, :, 1] = np.arange(h // 2 - h, h // 2, dtype=np.float32)[:, None]
        pos[:, :, 2] = np.arange(w // 2 - w, w // 2, dtype=np.float32)[None, :]
        return pos.reshape(-1, self.num_axes)

    def prepare_context_position_ids(
        self, seq_len: int, global_index: int = 0
    ) -> np.ndarray:
        pos = np.zeros((seq_len, self.num_axes), dtype=np.float32)
        pos[:, 0] = global_index
        pos[:, 1] = np.arange(seq_len)
        pos[:, 2] = np.arange(seq_len)
        return pos


class NormalizedPopeEmbedder(PopeEmbedder):
    """Positions rescaled to a fixed span per segment
    (reference ``pope.py:210-368``). Embedding happens per token segment
    BEFORE concatenation, since the span depends on the segment's own ids."""

    def _axis_freqs_normalized(
        self, positions: np.ndarray, dim: int
    ) -> np.ndarray:
        span = positions.max() - positions.min()
        if span != 0:
            positions = positions / span * self.normalize_by
        return self._axis_freqs(positions, dim)

    def __call__(self, position_ids: np.ndarray) -> np.ndarray:
        parts = []
        for i, dim in enumerate(self.axes_dims):
            if self.do_normalize[i]:
                parts.append(
                    self._axis_freqs_normalized(position_ids[..., i], dim)
                )
            else:
                parts.append(self._axis_freqs(position_ids[..., i], dim))
        return np.concatenate(parts, axis=-2)

    def prepare_image_position_ids(
        self, height: int, width: int, patch_size: int, global_index: int
    ) -> np.ndarray:
        """Symmetric fractional centering (reference ``pope.py:314-349``)."""
        h = height // patch_size
        w = width // patch_size
        pos = np.zeros((h, w, self.num_axes), dtype=np.float32)
        pos[:, :, 0] = global_index
        pos[:, :, 1] = (np.arange(h, dtype=np.float32) - (h - 1) / 2)[:, None]
        pos[:, :, 2] = (np.arange(w, dtype=np.float32) - (w - 1) / 2)[None, :]
        return pos.reshape(-1, self.num_axes)


class PopeAttention(Attention):
    """Attention with PoPE q/k transform and learned K phase bias
    (reference ``src/models/jit/denoiser.py:400-477``). q/k head dims double,
    so attention runs on 2*head_dim (the XLA path handles q/k vs v dim
    mismatch; the value dim stays head_dim)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.pope_bias = nnx.Param(
            jnp.zeros((self.num_heads, self.head_dim), dtype=jnp.float32)
        )

    def __call__(self, hidden_states, rope_freqs, kv_lens=None, key_mask=None):
        b, s, _ = hidden_states.shape
        q = self._split_heads(self.to_q(hidden_states))
        k = self._split_heads(self.to_k(hidden_states))
        v = self._split_heads(self.to_v(hidden_states))
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = apply_pope(q, rope_freqs)
        k = apply_pope(
            k,
            rope_freqs,
            learned_bias=jnp.clip(self.pope_bias.value, -jnp.pi, jnp.pi),
        )
        if kv_lens is not None and key_mask is None:
            attn = dot_product_attention(q, k, v, kv_lens=kv_lens, backend="xla")
        elif key_mask is not None:
            attn = dot_product_attention(q, k, v, mask=key_mask, backend="xla")
        else:
            attn = dot_product_attention(q, k, v, backend="xla")
        attn = attn.astype(hidden_states.dtype).reshape(b, s, -1)
        return self.to_o(attn)
