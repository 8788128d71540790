"""Shared JAX decoder-only LM for text conditioning encoders.

Covers the two towers the reference wraps via transformers (CUDA side):
- GLM-4 for CogView4 (``src/models/cogview4/text_encoder.py``): GQA, partial
  interleaved rotary, fused gate_up MLP, attention bias
- Qwen3 for text-conditioned JiT (``src/models/jit/text_encoder.py``): per-head
  q/k RMSNorm, full rotate-half rotary, split gate/up MLP

State paths mirror HF transformers key names (embed_tokens, layers.N.self_attn
.{q,k,v,o}_proj, mlp.*, input_layernorm, post_attention_layernorm, norm) so
local HF safetensors load through the generic converter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.norm import fp32_rms_norm


@dataclass
class DecoderLMConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 1.0
    attention_bias: bool = False
    hidden_act: str = "silu"
    arch: str = "qwen3"  # "glm" | "qwen3"


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rotate_interleaved(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rotary(x, cos, sin, interleaved: bool):
    """x (B, S, H, D_rot); cos/sin (S, D_rot)."""
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    rot = _rotate_interleaved(x) if interleaved else _rotate_half(x)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(
        x.dtype
    )


class Attention(nnx.Module):
    def __init__(self, config: DecoderLMConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        c = config
        self.config = c
        d = c.hidden_size
        self.rotary_dim = int(c.head_dim * c.partial_rotary_factor)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = nnx.Linear(d, c.num_attention_heads * c.head_dim,
                                 use_bias=c.attention_bias, **kw)
        self.k_proj = nnx.Linear(d, c.num_key_value_heads * c.head_dim,
                                 use_bias=c.attention_bias, **kw)
        self.v_proj = nnx.Linear(d, c.num_key_value_heads * c.head_dim,
                                 use_bias=c.attention_bias, **kw)
        self.o_proj = nnx.Linear(c.num_attention_heads * c.head_dim, d,
                                 use_bias=False, **kw)
        if c.arch == "qwen3":
            self.q_norm = nnx.Param(jnp.ones((c.head_dim,), dtype=param_dtype))
            self.k_norm = nnx.Param(jnp.ones((c.head_dim,), dtype=param_dtype))
        else:
            self.q_norm = None
            self.k_norm = None

    def __call__(self, x, cos, sin, causal_bias):
        c = self.config
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, c.num_attention_heads, c.head_dim)
        k = self.k_proj(x).reshape(b, s, c.num_key_value_heads, c.head_dim)
        v = self.v_proj(x).reshape(b, s, c.num_key_value_heads, c.head_dim)
        if self.q_norm is not None:
            q = fp32_rms_norm(q, self.q_norm.value, c.rms_norm_eps)
            k = fp32_rms_norm(k, self.k_norm.value, c.rms_norm_eps)
        rd = self.rotary_dim
        interleaved = c.arch == "glm"
        q = jnp.concatenate(
            [_apply_rotary(q[..., :rd], cos, sin, interleaved), q[..., rd:]],
            axis=-1,
        )
        k = jnp.concatenate(
            [_apply_rotary(k[..., :rd], cos, sin, interleaved), k[..., rd:]],
            axis=-1,
        )
        # GQA: expand kv heads
        groups = c.num_attention_heads // c.num_key_value_heads
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (c.head_dim**-0.5) + causal_bias[None, None]
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, -1)
        return self.o_proj(out)


class MLP(nnx.Module):
    def __init__(self, config: DecoderLMConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        c = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.arch = c.arch
        if c.arch == "glm":
            self.gate_up_proj = nnx.Linear(
                c.hidden_size, 2 * c.intermediate_size, use_bias=False, **kw
            )
        else:
            self.gate_proj = nnx.Linear(c.hidden_size, c.intermediate_size,
                                        use_bias=False, **kw)
            self.up_proj = nnx.Linear(c.hidden_size, c.intermediate_size,
                                      use_bias=False, **kw)
        self.down_proj = nnx.Linear(c.intermediate_size, c.hidden_size,
                                    use_bias=False, **kw)

    def __call__(self, x):
        if self.arch == "glm":
            gate, up = jnp.split(self.gate_up_proj(x), 2, axis=-1)
        else:
            gate, up = self.gate_proj(x), self.up_proj(x)
        return self.down_proj(jax.nn.silu(gate) * up)


class DecoderLayer(nnx.Module):
    def __init__(self, config: DecoderLMConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        c = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.self_attn = Attention(c, **kw)
        self.mlp = MLP(c, **kw)
        self.input_layernorm = nnx.Param(
            jnp.ones((c.hidden_size,), dtype=param_dtype)
        )
        self.post_attention_layernorm = nnx.Param(
            jnp.ones((c.hidden_size,), dtype=param_dtype)
        )
        self.eps = c.rms_norm_eps

    def __call__(self, x, cos, sin, causal_bias):
        h = fp32_rms_norm(x, self.input_layernorm.value, self.eps)
        x = x + self.self_attn(h, cos, sin, causal_bias)
        h = fp32_rms_norm(x, self.post_attention_layernorm.value, self.eps)
        return x + self.mlp(h)


class DecoderLMOutput(NamedTuple):
    last_hidden_state: jax.Array
    penultimate_hidden_state: jax.Array


class DecoderLM(nnx.Module):
    def __init__(self, config: DecoderLMConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        c = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size,
                                      param_dtype=param_dtype, dtype=dtype,
                                      rngs=rngs)
        self.layers = nnx.List([
            DecoderLayer(c, **kw) for _ in range(c.num_hidden_layers)
        ])
        self.norm = nnx.Param(jnp.ones((c.hidden_size,), dtype=param_dtype))
        self.eps = c.rms_norm_eps

    def _rope_tables(self, seq: int) -> tuple[np.ndarray, np.ndarray]:
        c = self.config
        rd = int(c.head_dim * c.partial_rotary_factor)
        inv_freq = 1.0 / (
            c.rope_theta ** (np.arange(0, rd, 2, dtype=np.float64) / rd)
        )
        t = np.arange(seq, dtype=np.float64)
        freqs = np.outer(t, inv_freq)
        if c.arch == "glm":
            # interleaved: each angle duplicated for its pair
            emb = np.repeat(freqs, 2, axis=-1)
        else:
            emb = np.concatenate([freqs, freqs], axis=-1)
        return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)

    def __call__(self, input_ids: jax.Array) -> DecoderLMOutput:
        seq = input_ids.shape[1]
        cos_np, sin_np = self._rope_tables(seq)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        causal = jnp.triu(
            jnp.full((seq, seq), jnp.finfo(jnp.float32).min), k=1
        )
        x = self.embed_tokens(input_ids)
        penultimate = x
        for i, layer in enumerate(self.layers):
            if i == len(self.layers) - 1:
                penultimate = x
            x = layer(x, cos, sin, causal)
        last = fp32_rms_norm(x, self.norm.value, self.eps)
        return DecoderLMOutput(
            last_hidden_state=last, penultimate_hidden_state=penultimate
        )
