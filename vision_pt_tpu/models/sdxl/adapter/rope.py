"""RoPE retrofit for the SDXL UNet (rebuild of reference
``src/models/sdxl/adapter/rope.py``).

Retrofits 2D rotary embeddings into the UNet's self/cross attention for
resolution generalization, with enable/disable switches for distillation
against the frozen non-RoPE teacher. Frequencies are trace-time NumPy tables
per (height, width) / context length.
"""

from __future__ import annotations

import functools
import math
from contextlib import contextmanager
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....ops.attention import dot_product_attention
from ....ops.rope import apply_rope
from ....peft.functional import iter_named_modules
from ..config import DenoiserConfig, SDXLConfig
from ..denoiser import CrossAttention, Denoiser, SelfAttention, TransformerBlock
from ..pipeline import SDXLModel

ORIGIN_POSITION = Literal["top_left", "center"]


@functools.lru_cache(maxsize=256)
def _freq_table(
    positions_key: tuple, dims: tuple[int, ...], theta: float
) -> np.ndarray:
    """(seq, sum(dims)//2, 2) cos/sin from per-axis integer positions."""
    positions = np.asarray(positions_key, dtype=np.float64)  # (seq, n_axes)
    parts = []
    for i, dim in enumerate(dims):
        omega = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        angles = np.outer(positions[:, i], omega)
        parts.append(
            np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)
        )
    return np.concatenate(parts, axis=-2)


class RoPEEmbedder:
    """2D image + diagonal context position tables
    (reference ``rope.py:59-186``)."""

    def __init__(self, rope_dims=(32, 32), rope_theta: float = 10000.0,
                 origin_position: ORIGIN_POSITION = "top_left"):
        self.rope_dims = tuple(rope_dims)
        self.rope_theta = rope_theta
        self.origin_position = origin_position

    def get_image_freqs(self, height: int, width: int) -> np.ndarray:
        ys = np.arange(height, dtype=np.int64)
        xs = np.arange(width, dtype=np.int64)
        if self.origin_position == "center":
            ys = ys - math.ceil(height // 2)
            xs = xs - math.ceil(width // 2)
        yy = np.repeat(ys, width)
        xx = np.tile(xs, height)
        positions = tuple(map(tuple, np.stack([yy, xx], axis=1)))
        return _freq_table(positions, self.rope_dims, self.rope_theta)

    def get_context_freqs(self, length: int) -> np.ndarray:
        ids = np.arange(length, dtype=np.int64)
        positions = tuple(map(tuple, np.stack([ids, ids], axis=1)))
        return _freq_table(positions, self.rope_dims, self.rope_theta)


class _WithRoPE:
    rope_enabled: bool = True

    def set_rope_enabled(self, enabled: bool):
        self.rope_enabled = enabled


class SelfAttentionWithRoPE(SelfAttention, _WithRoPE):
    """Reference ``rope.py:196-259``."""

    def __call__(self, hidden_states, mask=None, image_freqs=None, **kwargs):
        b, s, _ = hidden_states.shape
        q = self.to_q(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        if self.rope_enabled and image_freqs is not None:
            q = apply_rope(q.transpose(0, 2, 1, 3), image_freqs).transpose(0, 2, 1, 3)
            k = apply_rope(k.transpose(0, 2, 1, 3), image_freqs).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, mask=mask)
        return self.to_out(attn.astype(hidden_states.dtype).reshape(b, s, -1))


class CrossAttentionWithRoPE(CrossAttention, _WithRoPE):
    """Reference ``rope.py:261-317``."""

    def __call__(self, query, context, mask=None, image_freqs=None,
                 context_freqs=None, time_embedding=None, **kwargs):
        b, s, _ = query.shape
        sk = context.shape[1]
        q = self.to_q(query).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(context).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.to_v(context).reshape(b, sk, self.num_heads, self.head_dim)
        if self.rope_enabled and image_freqs is not None:
            q = apply_rope(q.transpose(0, 2, 1, 3), image_freqs).transpose(0, 2, 1, 3)
            k = apply_rope(k.transpose(0, 2, 1, 3), context_freqs).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, mask=mask)
        return self.to_out(attn.astype(query.dtype).reshape(b, s, -1))


class MigrationScale(nnx.Module):
    """Learnable teacher->RoPE migration blend (reference ``rope.py:319-347``)."""

    def __init__(self, init_ratio: float = 0.0, log_scale: bool = False):
        self.log_scale = log_scale
        init = math.exp(init_ratio) if log_scale else init_ratio
        self.scale = nnx.Param(jnp.asarray(init, dtype=jnp.float32))

    def get_scale(self) -> jax.Array:
        if self.log_scale:
            return jnp.log(self.scale.value)
        return self.scale.value


class TransformerWithRoPE(TransformerBlock, _WithRoPE):
    """Reference ``rope.py:350-434``."""

    self_attention_class = SelfAttentionWithRoPE
    cross_attention_class = CrossAttentionWithRoPE

    rope_dims = (32, 32)
    rope_theta = 10000.0
    origin_position: ORIGIN_POSITION = "center"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.rope_embedder = RoPEEmbedder(
            rope_dims=self.rope_dims,
            rope_theta=self.rope_theta,
            origin_position=self.origin_position,
        )

    def __call__(self, hidden_states, context, time_embedding=None,
                 cross_attention_kwargs=None, height=None, width=None,
                 **kwargs):
        image_freqs = context_freqs = None
        if self.rope_enabled:
            assert height is not None and width is not None
            image_freqs = jnp.asarray(
                self.rope_embedder.get_image_freqs(height, width)
            )
            context_freqs = jnp.asarray(
                self.rope_embedder.get_context_freqs(context.shape[1])
            )
        hidden_states = hidden_states + self.attn1(
            self.norm1(hidden_states), image_freqs=image_freqs
        )
        hidden_states = hidden_states + self.attn2(
            self.norm2(hidden_states),
            context=context,
            time_embedding=time_embedding,
            image_freqs=image_freqs,
            context_freqs=context_freqs,
            **(cross_attention_kwargs or {}),
        )
        return hidden_states + self.ff(self.norm3(hidden_states))


class DenoiserConfigWithRoPE(DenoiserConfig):
    rope_enabled: bool = True
    migrating: bool = False
    rope_dims: list[int] = [32, 32]
    rope_theta: float = 10000.0
    origin_position: ORIGIN_POSITION = "center"


class DenoiserWithRoPE(Denoiser):
    """Reference ``rope.py:446-518``."""

    transformer_block_class = TransformerWithRoPE

    def __init__(self, config: DenoiserConfigWithRoPE, **kw):
        super().__init__(config, **kw)
        self.apply_rope_config(config)
        self.set_rope_enabled(config.rope_enabled)

    def apply_rope_config(self, config: DenoiserConfigWithRoPE):
        for _, module in iter_named_modules(self):
            if isinstance(module, TransformerWithRoPE):
                module.rope_embedder = RoPEEmbedder(
                    rope_dims=tuple(config.rope_dims),
                    rope_theta=config.rope_theta,
                    origin_position=config.origin_position,
                )

    def set_rope_enabled(self, enabled: bool):
        self.rope_enabled = enabled
        for _, module in iter_named_modules(self):
            if isinstance(module, _WithRoPE):
                module.set_rope_enabled(enabled)


class SDXLWithRoPEConfig(SDXLConfig):
    denoiser: DenoiserConfigWithRoPE = DenoiserConfigWithRoPE()


class SDXLWithRoPEModel(SDXLModel):
    """Reference ``rope.py:525-556``."""

    denoiser_class = DenoiserWithRoPE


def _resolve_denoiser(target) -> DenoiserWithRoPE:
    return target.denoiser if hasattr(target, "denoiser") else target


@contextmanager
def while_rope_enabled(model):
    """``model`` may be the pipeline or the denoiser itself. Inside a traced
    loss, pass the in-trace (merged) denoiser — nnx forbids mutating modules
    from an outer trace level."""
    denoiser = _resolve_denoiser(model)
    original = denoiser.rope_enabled
    denoiser.set_rope_enabled(True)
    try:
        yield
    finally:
        denoiser.set_rope_enabled(original)


@contextmanager
def while_rope_disabled(model):
    denoiser = _resolve_denoiser(model)
    original = denoiser.rope_enabled
    denoiser.set_rope_enabled(False)
    try:
        yield
    finally:
        denoiser.set_rope_enabled(original)
