"""CogView4 DiT, TPU-native (rebuild of reference
``src/models/cogview4/denoiser.py``).

Joint text+image token stream with per-stream AdaLN-Zero conditioning (12-way
time projection), rotate-half RoPE on the image tokens only, shared
feed-forward over both streams, and an AdaLN final layer. NHWC latents;
patchify uses the shared (c, ph, pw) feature ordering (reference uses
``modules/patch.py`` here — unlike JiT's own unpatchify).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.attention import dot_product_attention
from ...ops.norm import fp32_layer_norm
from ...ops.patch import patchify, unpatchify
from ...ops.timestep.embedding import (
    TextTimestepEmbedding,
    TimestepEmbedding,
    get_timestep_embedding,
)
from ...ops.offload import LayerwiseOffloadStrategy, OffloadableModuleMixin
from .config import DenoiserConfig


class GlobalConditionEmbedding(nnx.Module):
    """Timestep + pooled SDXL-style size conditions
    (reference ``denoiser.py:27-108``)."""

    def __init__(self, embedding_dim: int, condition_dim: int,
                 pooled_projection_dim: int, timesteps_dim: int = 256,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.condition_dim = condition_dim
        self.timesteps_dim = timesteps_dim
        self.timestep_embedder = TimestepEmbedding(
            in_channels=timesteps_dim, time_embed_dim=embedding_dim,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.condition_embedder = TextTimestepEmbedding(
            in_dim=pooled_projection_dim, hidden_dim=embedding_dim,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def _encode_condition(self, condition: jax.Array) -> jax.Array:
        return get_timestep_embedding(
            condition, embedding_dim=self.condition_dim,
            flip_sin_to_cos=True, downscale_freq_shift=0,
        )

    def __call__(self, timestep, original_size, target_size, crop_coords,
                 hidden_dtype) -> jax.Array:
        t_proj = get_timestep_embedding(
            timestep, embedding_dim=self.timesteps_dim,
            flip_sin_to_cos=True, downscale_freq_shift=0,
        )
        batch = original_size.shape[0]
        conds = [
            self._encode_condition(c.reshape(-1)).reshape(batch, -1)
            for c in (original_size, crop_coords, target_size)
        ]
        cond_proj = jnp.concatenate(conds, axis=1)
        t_emb = self.timestep_embedder(t_proj.astype(hidden_dtype))
        c_emb = self.condition_embedder(cond_proj.astype(hidden_dtype))
        return jax.nn.silu(t_emb + c_emb)


class PatchEmbed(nnx.Module):
    """Patch + text projections (reference ``denoiser.py:111-132``)."""

    def __init__(self, in_channels, hidden_dim, patch_size, text_hidden_dim,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.proj = nnx.Linear(in_channels * patch_size**2, hidden_dim,
                               dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.text_proj = nnx.Linear(text_hidden_dim, hidden_dim, dtype=dtype,
                                    param_dtype=param_dtype, rngs=rngs)

    def __call__(self, patches, encoder_hidden_states):
        return self.proj(patches), self.text_proj(encoder_hidden_states)


class AdaLayerNormZero(nnx.Module):
    """12-way AdaLN-Zero over both streams (reference ``denoiser.py:148-200``)."""

    def __init__(self, embedding_dim: int, dim: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.linear = nnx.Linear(embedding_dim, 12 * dim, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, hidden_states, encoder_hidden_states, time_embed):
        norm_h = fp32_layer_norm(hidden_states, eps=1e-5)
        norm_c = fp32_layer_norm(encoder_hidden_states, eps=1e-5)
        emb = self.linear(time_embed)
        (
            shift_msa, c_shift_msa, scale_msa, c_scale_msa, gate_msa,
            c_gate_msa, shift_mlp, c_shift_mlp, scale_mlp, c_scale_mlp,
            gate_mlp, c_gate_mlp,
        ) = jnp.split(emb, 12, axis=1)
        h = norm_h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        c = norm_c * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]
        return (
            h.astype(hidden_states.dtype), gate_msa, shift_mlp, scale_mlp,
            gate_mlp, c.astype(encoder_hidden_states.dtype), c_gate_msa,
            c_shift_mlp, c_scale_mlp, c_gate_mlp,
        )


def apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE (reference ``denoiser.py:203-218``): (real, imag) are
    the two HALVES of the feature dim, not interleaved pairs. x is
    (B, S, H, D); cos/sin (S, D)."""
    orig_dtype = x.dtype
    half = x.shape[-1] // 2
    real, imag = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-imag, real], axis=-1)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return (
        x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    ).astype(orig_dtype)


class SelfAttention(nnx.Module):
    """Joint text+image attention; RoPE on the image segment only
    (reference ``denoiser.py:221-310``)."""

    def __init__(self, hidden_dim, num_heads, use_bias=True, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = hidden_dim // num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = nnx.Linear(hidden_dim, hidden_dim, use_bias=use_bias, **kw)
        self.to_k = nnx.Linear(hidden_dim, hidden_dim, use_bias=use_bias, **kw)
        self.to_v = nnx.Linear(hidden_dim, hidden_dim, use_bias=use_bias, **kw)
        self.to_out = nnx.Linear(hidden_dim, hidden_dim, use_bias=use_bias, **kw)

    def __call__(self, hidden_states, encoder_hidden_states, rope_cos, rope_sin):
        text_len = encoder_hidden_states.shape[1]
        joint = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        b, s, _ = joint.shape
        q = self.to_q(joint).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(joint).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(joint).reshape(b, s, self.num_heads, self.head_dim)
        q = fp32_layer_norm(q, eps=1e-5).astype(q.dtype)
        k = fp32_layer_norm(k, eps=1e-5).astype(k.dtype)
        q_img = apply_rotary_emb(q[:, text_len:], rope_cos, rope_sin)
        k_img = apply_rotary_emb(k[:, text_len:], rope_cos, rope_sin)
        q = jnp.concatenate([q[:, :text_len], q_img], axis=1)
        k = jnp.concatenate([k[:, :text_len], k_img], axis=1)
        attn = dot_product_attention(q, k, v)
        attn = attn.astype(joint.dtype).reshape(b, s, -1)
        out = self.to_out(attn)
        return out[:, text_len:], out[:, :text_len]


class FeedForward(nnx.Module):
    """MLP with tanh-approximate GeLU (reference ``denoiser.py:313-341``;
    torch keys net.0.proj / net.2)."""

    def __init__(self, hidden_dim, mlp_scale: float = 4.0, use_bias=True,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        inner = int(hidden_dim * mlp_scale)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj = nnx.Linear(hidden_dim, inner, use_bias=use_bias, **kw)
        self.out = nnx.Linear(inner, hidden_dim, use_bias=use_bias, **kw)

    def __call__(self, x):
        return self.out(jax.nn.gelu(self.proj(x), approximate=True))


class TransformerBlock(nnx.Module):
    """Reference ``denoiser.py:346-423``."""

    def __init__(self, hidden_dim=2560, num_attention_heads=64,
                 time_embed_dim=512, *, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = AdaLayerNormZero(time_embed_dim, hidden_dim, **kw)
        self.attn1 = SelfAttention(hidden_dim, num_attention_heads, **kw)
        self.ff = FeedForward(hidden_dim, **kw)

    def __call__(self, hidden_states, encoder_hidden_states, time_embed,
                 rope_cos, rope_sin):
        (
            norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp,
            norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp,
        ) = self.norm1(hidden_states, encoder_hidden_states, time_embed)

        attn_h, attn_c = self.attn1(norm_h, norm_c, rope_cos, rope_sin)
        hidden_states = hidden_states + attn_h * gate_msa[:, None].astype(attn_h.dtype)
        encoder_hidden_states = (
            encoder_hidden_states
            + attn_c * c_gate_msa[:, None].astype(attn_c.dtype)
        )

        norm_h2 = (
            fp32_layer_norm(hidden_states, eps=1e-5) * (1 + scale_mlp[:, None])
            + shift_mlp[:, None]
        ).astype(hidden_states.dtype)
        norm_c2 = (
            fp32_layer_norm(encoder_hidden_states, eps=1e-5)
            * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ).astype(encoder_hidden_states.dtype)

        hidden_states = hidden_states + self.ff(norm_h2) * gate_mlp[:, None].astype(
            hidden_states.dtype
        )
        encoder_hidden_states = encoder_hidden_states + self.ff(
            norm_c2
        ) * c_gate_mlp[:, None].astype(encoder_hidden_states.dtype)
        return hidden_states, encoder_hidden_states


class RoPE:
    """2-axis rotate-half tables (reference ``denoiser.py:426-484``).
    Host-side NumPy; tables are constants per static latent shape."""

    def __init__(self, head_dim: int, patch_size: int,
                 rope_axes_dim: tuple[int, int], theta: float = 10000.0):
        self.patch_size = patch_size
        self.rope_axes_dim = tuple(rope_axes_dim)
        dim_h = dim_w = head_dim // 2
        self.h_inv_freq = 1.0 / (
            theta ** (np.arange(0, dim_h, 2, dtype=np.float32)[: dim_h // 2] / dim_h)
        )
        self.w_inv_freq = 1.0 / (
            theta ** (np.arange(0, dim_w, 2, dtype=np.float32)[: dim_w // 2] / dim_w)
        )

    def __call__(self, latent_h: int, latent_w: int) -> tuple[np.ndarray, np.ndarray]:
        h, w = latent_h // self.patch_size, latent_w // self.patch_size
        inner_h = (np.arange(h) * self.rope_axes_dim[0] // h).astype(np.float32)
        inner_w = (np.arange(w) * self.rope_axes_dim[1] // w).astype(np.float32)
        freqs_h = np.outer(inner_h, self.h_inv_freq)  # (h, d/4)
        freqs_w = np.outer(inner_w, self.w_inv_freq)
        fh = np.broadcast_to(freqs_h[:, None, :], (h, w, freqs_h.shape[-1]))
        fw = np.broadcast_to(freqs_w[None, :, :], (h, w, freqs_w.shape[-1]))
        freqs = np.concatenate([fh, fw], axis=-1)
        freqs = np.concatenate([freqs, freqs], axis=-1).reshape(h * w, -1)
        return np.cos(freqs), np.sin(freqs)


class FinalAdaLayerNorm(nnx.Module):
    """Reference ``denoiser.py:486-523``."""

    def __init__(self, hidden_dim: int, condition_dim: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.linear = nnx.Linear(condition_dim, 2 * hidden_dim, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, hidden_states, condition):
        condition = jax.nn.silu(condition).astype(hidden_states.dtype)
        scale, shift = jnp.split(self.linear(condition), 2, axis=-1)
        out = (
            fp32_layer_norm(hidden_states, eps=1e-5) * (1 + scale)[:, None]
            + shift[:, None]
        )
        return out.astype(hidden_states.dtype)


class CogView4DiT(nnx.Module, OffloadableModuleMixin):
    """Reference ``denoiser.py:526-667``; supports layer-group offload
    (reference wires it at ``denoiser.py:637-642``)."""

    def __init__(self, config: DenoiserConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        cfg = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.inner_dim = cfg.num_attention_heads * cfg.attention_head_dim
        self.out_channels = cfg.out_channels
        self.patch_size = cfg.patch_size
        self.vae_compression_ratio = cfg.vae_compression_ratio
        self.pooled_projection_dim = 3 * 2 * cfg.condition_dim

        self.rope = RoPE(
            head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
            rope_axes_dim=tuple(cfg.rope_axes_dim),
        )
        self.patch_embed = PatchEmbed(
            in_channels=cfg.in_channels, hidden_dim=self.inner_dim,
            patch_size=cfg.patch_size, text_hidden_dim=cfg.text_embed_dim, **kw,
        )
        self.time_condition_embed = GlobalConditionEmbedding(
            embedding_dim=cfg.time_embed_dim, condition_dim=cfg.condition_dim,
            pooled_projection_dim=self.pooled_projection_dim,
            timesteps_dim=self.inner_dim, **kw,
        )
        self.transformer_blocks = nnx.List([
            TransformerBlock(
                self.inner_dim, cfg.num_attention_heads, cfg.time_embed_dim, **kw
            )
            for _ in range(cfg.num_layers)
        ])
        self.norm_out = FinalAdaLayerNorm(
            hidden_dim=self.inner_dim, condition_dim=cfg.time_embed_dim, **kw
        )
        self.proj_out = nnx.Linear(
            self.inner_dim, cfg.patch_size**2 * cfg.out_channels, **kw
        )
        self.gradient_checkpointing = False

    def set_gradient_checkpointing(self, enable: bool):
        self.gradient_checkpointing = enable

    def __call__(
        self,
        latent: jax.Array,  # (B, H, W, C) NHWC
        encoder_hidden_states: jax.Array,  # (B, text_len, text_embed_dim)
        timestep: jax.Array,  # (B,)
        original_size: jax.Array,  # (B, 2)
        target_size: jax.Array,
        crop_coords: jax.Array,
    ) -> jax.Array:
        batch, height, width, _ = latent.shape
        patches = patchify(latent, self.patch_size).patches
        hidden_states, encoder_hidden_states = self.patch_embed(
            patches, encoder_hidden_states
        )
        cos_np, sin_np = self.rope(height, width)
        rope_cos = jnp.asarray(cos_np)
        rope_sin = jnp.asarray(sin_np)
        global_cond = self.time_condition_embed(
            timestep, original_size, target_size, crop_coords,
            hidden_states.dtype,
        )
        for i, block in enumerate(self.transformer_blocks):
            if self.offload_strategy is not None:
                self.maybe_offload_by_group(list(self.transformer_blocks), i)
            hidden_states, encoder_hidden_states = block(
                hidden_states, encoder_hidden_states, global_cond,
                rope_cos, rope_sin,
            )
        hidden_states = self.norm_out(hidden_states, global_cond)
        hidden_states = self.proj_out(hidden_states)
        return unpatchify(
            hidden_states,
            height // self.patch_size,
            width // self.patch_size,
            self.patch_size,
            self.out_channels,
        )


class Denoiser(CogView4DiT):
    pass
