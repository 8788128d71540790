"""Sinusoidal timestep embeddings + MLP embedders.

TPU-native rebuild of the reference's ``src/modules/timestep/embedding.py``
(itself the diffusers/DDPM formulation). The sinusoid is computed in fp32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx


def get_timestep_embedding(
    timesteps: jax.Array,  # (N,) possibly fractional
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """DDPM sinusoidal embedding, matching reference ``embedding.py:10-62``.

    Returns (*timesteps.shape, embedding_dim) fp32: [sin | cos] (or
    [cos | sin] if flipped), zero-padded if embedding_dim is odd. Leading
    dims are preserved (no batch flattening — flattening the batch axis into
    the element axis forces an SPMD full-rematerialization when the batch is
    sharded over a mesh).
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[..., None] * emb
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate(
            [emb[..., half_dim:], emb[..., :half_dim]], axis=-1
        )
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "tanh": jnp.tanh,
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation: {name}") from None


class TimestepEmbedding(nnx.Module):
    """Linear -> act -> Linear over the sinusoid (reference ``embedding.py:65-85``)."""

    def __init__(
        self,
        in_channels: int,
        time_embed_dim: int,
        act_fn: str = "silu",
        use_bias: bool = True,
        *,
        param_dtype: jnp.dtype = jnp.float32,
        dtype: jnp.dtype | None = None,
        rngs: nnx.Rngs,
    ):
        self.linear_1 = nnx.Linear(
            in_channels,
            time_embed_dim,
            use_bias=use_bias,
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )
        self.act = get_activation(act_fn)
        self.linear_2 = nnx.Linear(
            time_embed_dim,
            time_embed_dim,
            use_bias=use_bias,
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )

    def __call__(self, sample: jax.Array) -> jax.Array:
        return self.linear_2(self.act(self.linear_1(sample)))


class TextTimestepEmbedding(nnx.Module):
    """Pooled-text conditioner MLP (reference ``embedding.py:88-108``)."""

    def __init__(
        self,
        in_dim: int,
        hidden_dim: int,
        act_fn: str = "silu",
        use_bias: bool = True,
        *,
        param_dtype: jnp.dtype = jnp.float32,
        dtype: jnp.dtype | None = None,
        rngs: nnx.Rngs,
    ):
        self.linear_1 = nnx.Linear(
            in_dim,
            hidden_dim,
            use_bias=use_bias,
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )
        self.act = get_activation(act_fn)
        self.linear_2 = nnx.Linear(
            hidden_dim,
            hidden_dim,
            use_bias=use_bias,
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )

    def __call__(self, caption: jax.Array) -> jax.Array:
        return self.linear_2(self.act(self.linear_1(caption)))
