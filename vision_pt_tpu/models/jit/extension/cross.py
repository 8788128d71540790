"""Cross-JiT: separate cross-attention to context instead of in-sequence
concatenation.

Rebuild of reference ``src/models/jit/extension/cross.py``: the block stack is
sandwich-norm self-attention blocks over image tokens, with ONE cross-attention
block at depth//2 attending to context tokens with distinct q/k rope tables
and masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ....ops.attention import dot_product_attention
from ....ops.norm import get_norm_layer
from ..config import DenoiserConfig, JiTConfig
from ..denoiser import Attention, JiT, SwiGLU, apply_rope
from ..pipeline import JiTModel
from .pope import PopeAttention, apply_pope
from .uvit import NormPosition, UJiTBlock


class CrossAttention(Attention):
    """Cross-attention with separate q/k rope + masks
    (reference ``cross.py:32-89``)."""

    def __call__(self, hidden_states, key_value_states, query_rope_freqs,
                 key_rope_freqs, query_mask=None, key_mask=None):
        b, sq, _ = hidden_states.shape
        q = self._split_heads(self.to_q(hidden_states))
        k = self._split_heads(self.to_k(key_value_states))
        v = self._split_heads(self.to_v(key_value_states))
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = apply_rope(q, query_rope_freqs)
        k = apply_rope(k, key_rope_freqs)
        mask = _cross_mask(query_mask, key_mask)
        attn = dot_product_attention(
            q, k, v, mask=mask, backend="xla" if mask is not None else "auto"
        )
        attn = attn.astype(hidden_states.dtype).reshape(b, sq, -1)
        return self.to_o(attn)


class PopeCrossAttention(PopeAttention):
    """PoPE cross-attention (reference ``cross.py:91-153``)."""

    def __call__(self, hidden_states, key_value_states, query_rope_freqs,
                 key_rope_freqs, query_mask=None, key_mask=None):
        b, sq, _ = hidden_states.shape
        q = self._split_heads(self.to_q(hidden_states))
        k = self._split_heads(self.to_k(key_value_states))
        v = self._split_heads(self.to_v(key_value_states))
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = apply_pope(q, query_rope_freqs)
        k = apply_pope(
            k, key_rope_freqs,
            learned_bias=jnp.clip(self.pope_bias.value, -jnp.pi, jnp.pi),
        )
        mask = _cross_mask(query_mask, key_mask)
        attn = dot_product_attention(q, k, v, mask=mask, backend="xla")
        attn = attn.astype(hidden_states.dtype).reshape(b, sq, -1)
        return self.to_o(attn)


def _cross_mask(query_mask, key_mask):
    """(B, Sq) x (B, Sk) -> (B, 1, Sq, Sk) bool, or None."""
    if query_mask is None or key_mask is None:
        return None
    return (
        query_mask.astype(jnp.bool_)[:, None, :, None]
        & key_mask.astype(jnp.bool_)[:, None, None, :]
    )


class CrossJiTBlock(nnx.Module):
    """Cross-attention block (reference ``cross.py:281-386``)."""

    def __init__(self, hidden_dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                 qk_norm=True, use_bias=True, eps=1e-6,
                 positional_encoding="rope", norm_type="rms",
                 norm_position: NormPosition = "sandwich",
                 attn_dropout=0.0, proj_dropout=0.0,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.has_pre_norm = norm_position in ("pre", "sandwich")
        self.has_post_norm = norm_position in ("post", "sandwich")
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        def norm():
            return get_norm_layer(norm_type, hidden_dim, eps=eps,
                                  param_dtype=param_dtype)

        self.norm_attn_image_pre = norm() if self.has_pre_norm else None
        self.norm_attn_post = norm() if self.has_post_norm else None
        self.norm_attn_context_pre = norm() if self.has_pre_norm else None
        attention_class = (
            PopeCrossAttention if positional_encoding == "pope" else CrossAttention
        )
        self.attn = attention_class(
            dim=hidden_dim, num_heads=num_heads, qkv_bias=qkv_bias,
            qk_norm=qk_norm, attn_dropout=attn_dropout,
            proj_dropout=proj_dropout, norm_type="rms", **kw,
        )
        self.norm_mlp_pre = norm() if self.has_pre_norm else None
        self.norm_mlp_post = norm() if self.has_post_norm else None
        self.mlp = SwiGLU(hidden_dim, int(hidden_dim * mlp_ratio),
                          use_bias=use_bias, **kw)

    def __call__(self, image_hidden_states, context_hidden_states,
                 image_rope_freqs, context_rope_freqs, image_mask=None,
                 context_mask=None):
        h = image_hidden_states
        a = self.norm_attn_image_pre(h) if self.norm_attn_image_pre is not None else h
        c = (
            self.norm_attn_context_pre(context_hidden_states)
            if self.norm_attn_context_pre is not None else context_hidden_states
        )
        a = self.attn(a, c, image_rope_freqs, context_rope_freqs,
                      query_mask=image_mask, key_mask=context_mask)
        if self.norm_attn_post is not None:
            a = self.norm_attn_post(a)
        h = h + a
        m = self.norm_mlp_pre(h) if self.norm_mlp_pre is not None else h
        m = self.mlp(m)
        if self.norm_mlp_post is not None:
            m = self.norm_mlp_post(m)
        return h + m, context_hidden_states


class CrossJiTDenoiserConfig(DenoiserConfig):
    norm_position: NormPosition = "sandwich"


class CrossJiT(JiT):
    """Reference ``cross.py:392-718``: self-attn blocks with one
    cross-attention block at depth//2."""

    def _build_blocks(self, config: CrossJiTDenoiserConfig, *, dtype,
                      param_dtype, rngs: nnx.Rngs):
        kw = dict(
            hidden_dim=config.hidden_size, num_heads=config.num_heads,
            mlp_ratio=config.mlp_ratio, attn_dropout=config.attn_dropout,
            proj_dropout=config.proj_dropout, qkv_bias=True, qk_norm=True,
            use_bias=True, eps=1e-6,
            positional_encoding=config.positional_encoding,
            norm_type=config.norm_type, norm_position=config.norm_position,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        depth = config.depth
        self.blocks = nnx.List(
            [
                CrossJiTBlock(**kw) if i == depth // 2 else UJiTBlock(
                    has_skip_connection=False, **kw
                )
                for i in range(depth)
            ]
        )

    def __call__(self, image, timestep, context, original_size, target_size,
                 crop_coords, context_mask=None):
        height, width = image.shape[1], image.shape[2]
        (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        ) = self._prepare_inputs(
            image, timestep, context, original_size, target_size, crop_coords,
            context_mask,
        )
        context_len = context_embed.shape[1]
        batch = tokens.shape[0]
        image_freqs = freqs[:prefix_len]
        context_freqs = freqs[prefix_len : prefix_len + context_len]
        image_mask = (
            jnp.ones((batch, prefix_len), dtype=jnp.bool_)
            if context_mask is not None else None
        )
        ctx_mask = (
            context_mask.astype(jnp.bool_) if context_mask is not None else None
        )

        image_tokens = tokens
        context_tokens = context_embed
        for block in self.blocks:
            if isinstance(block, CrossJiTBlock):
                image_tokens, context_tokens = block(
                    image_tokens, context_tokens, image_freqs, context_freqs,
                    image_mask=image_mask, context_mask=ctx_mask,
                )
            else:
                image_tokens = block(image_tokens, image_freqs)

        patches = self.final_layer(image_tokens[:, :patches_len, :])
        return self.unpatchify(patches, height, width)


class Denoiser(CrossJiT):
    pass


class CrossJiTConfig(JiTConfig):
    denoiser: CrossJiTDenoiserConfig = CrossJiTDenoiserConfig()


class CrossJiTModel(JiTModel):
    denoiser_class = Denoiser
