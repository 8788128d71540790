"""Normalization layers with fp32 accumulation.

TPU-native rebuild of the reference's ``src/modules/norm.py`` (FP32LayerNorm,
FP32RMSNorm, SingleAdaLayerNormZero, DyTNrom/DerfNorm, get_norm_layer).
Semantics match the reference: statistics and the affine transform are computed
in float32 and the result is cast back to the input dtype. On TPU this keeps
the VPU reduction in fp32 while activations stay bf16; XLA fuses the casts.
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

NormType = Literal["layer", "rms", "dyt", "derf"]


def fp32_layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last axis, computed in float32, cast back to x.dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def fp32_rms_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """RMSNorm over the last axis, computed in float32, cast back to x.dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(ms + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(orig_dtype)


class FP32LayerNorm(nnx.Module):
    """LayerNorm with fp32 statistics (reference ``src/modules/norm.py:10-18``)."""

    def __init__(
        self,
        dim: int,
        *,
        elementwise_affine: bool = True,
        use_bias: bool = True,
        eps: float = 1e-6,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        self.eps = eps
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones((dim,), dtype=param_dtype))
            self.bias = (
                nnx.Param(jnp.zeros((dim,), dtype=param_dtype)) if use_bias else None
            )
        else:
            self.weight = None
            self.bias = None

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight.value if self.weight is not None else None
        b = self.bias.value if self.bias is not None else None
        return fp32_layer_norm(x, w, b, self.eps)


class FP32RMSNorm(nnx.Module):
    """RMSNorm with fp32 statistics (reference ``src/modules/norm.py:21-28``)."""

    def __init__(
        self,
        dim: int,
        *,
        elementwise_affine: bool = True,
        eps: float = 1e-6,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        self.eps = eps
        self.weight = (
            nnx.Param(jnp.ones((dim,), dtype=param_dtype))
            if elementwise_affine
            else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight.value if self.weight is not None else None
        return fp32_rms_norm(x, w, self.eps)


class AdaLayerNormZeroOutput(NamedTuple):
    hidden_states: jax.Array
    scale: jax.Array
    shift: jax.Array
    gate: jax.Array


class SingleAdaLayerNormZero(nnx.Module):
    """AdaLN-Zero conditioning (reference ``src/modules/norm.py:37-90``).

    time_embed -> SiLU -> Linear(2*hidden) -> (scale, shift) applied to the
    LayerNormed hidden states, plus a separate Linear gate. Both projections
    are zero-initialized so the block starts as identity.
    """

    def __init__(
        self,
        hidden_dim: int,
        gate_dim: int,
        embedding_dim: int,
        *,
        param_dtype: jnp.dtype = jnp.float32,
        dtype: jnp.dtype | None = None,
        rngs: nnx.Rngs,
    ):
        self.norm = FP32LayerNorm(hidden_dim, elementwise_affine=False, eps=1e-6)
        self.scale_shift = nnx.Linear(
            embedding_dim,
            2 * hidden_dim,
            use_bias=True,
            kernel_init=nnx.initializers.zeros_init(),
            bias_init=nnx.initializers.zeros_init(),
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )
        self.gate = nnx.Linear(
            embedding_dim,
            gate_dim,
            use_bias=True,
            kernel_init=nnx.initializers.zeros_init(),
            bias_init=nnx.initializers.zeros_init(),
            param_dtype=param_dtype,
            dtype=dtype,
            rngs=rngs,
        )

    def __call__(
        self, hidden_states: jax.Array, time_embed: jax.Array
    ) -> AdaLayerNormZeroOutput:
        normed = self.norm(hidden_states)
        t = jax.nn.silu(time_embed)
        scale_shift = self.scale_shift(t)
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        gate = self.gate(t)
        out = normed * (1.0 + scale[:, None, :]) + shift[:, None, :]
        return AdaLayerNormZeroOutput(
            hidden_states=out.astype(hidden_states.dtype),
            scale=scale,
            shift=shift,
            gate=gate,
        )


class DyTNorm(nnx.Module):
    """Dynamic Tanh norm (reference ``src/modules/norm.py:94-129``, DyT paper)."""

    def __init__(
        self,
        dim: int,
        *,
        elementwise_affine: bool = True,
        alpha_init_value: float = 0.5,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        self.alpha = nnx.Param(jnp.full((1,), alpha_init_value, dtype=param_dtype))
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones((dim,), dtype=param_dtype))
            self.bias = nnx.Param(jnp.zeros((dim,), dtype=param_dtype))
        else:
            self.weight = None
            self.bias = None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.tanh(self.alpha.value * x)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


class DerfNorm(nnx.Module):
    """Dynamic erf norm (reference ``src/modules/norm.py:133-173``, Derf paper)."""

    def __init__(
        self,
        dim: int,
        *,
        elementwise_affine: bool = True,
        alpha_init_value: float = 0.5,
        shift_init_value: float = 0.0,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        self.alpha = nnx.Param(jnp.full((1,), alpha_init_value, dtype=param_dtype))
        self.shift = nnx.Param(jnp.full((1,), shift_init_value, dtype=param_dtype))
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones((dim,), dtype=param_dtype))
            self.bias = nnx.Param(jnp.zeros((dim,), dtype=param_dtype))
        else:
            self.weight = None
            self.bias = None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.lax.erf(self.alpha.value * x + self.shift.value)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


def get_norm_layer(
    norm_type: NormType,
    dim: int,
    *,
    elementwise_affine: bool = True,
    eps: float = 1e-6,
    alpha_init_value: float = 0.5,
    shift_init_value: float = 0.0,
    param_dtype: jnp.dtype = jnp.float32,
    rngs: nnx.Rngs | None = None,
) -> nnx.Module:
    """Norm factory (reference ``src/modules/norm.py:179-215``)."""
    if norm_type == "layer":
        return FP32LayerNorm(
            dim, elementwise_affine=elementwise_affine, eps=eps, param_dtype=param_dtype
        )
    if norm_type == "rms":
        return FP32RMSNorm(
            dim, elementwise_affine=elementwise_affine, eps=eps, param_dtype=param_dtype
        )
    if norm_type == "dyt":
        return DyTNorm(
            dim,
            elementwise_affine=elementwise_affine,
            alpha_init_value=alpha_init_value,
            param_dtype=param_dtype,
        )
    if norm_type == "derf":
        return DerfNorm(
            dim,
            elementwise_affine=elementwise_affine,
            alpha_init_value=alpha_init_value,
            shift_init_value=shift_init_value,
            param_dtype=param_dtype,
        )
    raise ValueError(f"Unsupported norm type: {norm_type}")
