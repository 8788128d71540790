"""Quantized linear layers (replacing reference ``src/modules/quant/{bnb,ao,
quanto}.py`` wrappers with TPU-native modules).

Weights live packed in HBM; forward dequantizes on the fly (Pallas fused
kernel on TPU for kernel-friendly dims, XLA dequant+matmul elsewhere).
Backward passes gradients to the input only — quantized base weights are
frozen (the QLoRA contract).

Storage layout: when ``in_features % 128 == 0`` codes are kept in the Pallas
kernel's transposed deinterleaved (in//2, out) layout with (in//BLOCK, out)
scales (converted to/from bnb packing at the checkpoint boundary); otherwise
flat bnb packing with XLA dequant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .nf4 import (
    CODEBOOKS,
    QuantState4bit,
    dequantize_4bit,
    quantize_4bit,
    state_from_bnb_dict,
    state_to_bnb_dict,
)
from .pallas_nf4 import (
    BLOCK,
    dequant_matmul_4bit,
    kernel_supported,
    repack_bnb,
    repack_deinterleaved,
)


class QuantParam(nnx.Variable):
    """Packed quantized weight / scale — never trained, never sharded by
    FSDP's Param rules."""


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dequant_deint(packed_t, absmax_t, quant_type, shape, dtype):
    """XLA dense dequant from the transposed deinterleaved layout ->
    (out, in) (the transpose fuses into the consuming matmul)."""
    code = jnp.asarray(CODEBOOKS[quant_type])
    p = packed_t.astype(jnp.int32)  # (in//2, out)
    left = code[(p >> 4) & 0x0F]
    right = code[p & 0x0F]
    w_t = jnp.concatenate([left, right], axis=0)  # (in, out)
    scales = jnp.repeat(absmax_t.astype(jnp.float32), BLOCK, axis=0)
    return (w_t * scales).astype(dtype).T


# below this many x rows the op is weight-memory-bound and the Pallas
# fused dequant-matmul wins; above it (training batches) a dequant + plain
# XLA matmul is compute-bound anyway and compiles ~100x faster (a QLoRA
# UNet has ~560 quantized linears in ONE program — per-call Mosaic kernels
# blew the remote compiler's budget)
_PALLAS_MAX_ROWS = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _q4_matmul(x, packed, absmax, quant_type, shape, layout):
    m = 1
    for s in x.shape[:-1]:
        m *= int(s)
    if layout == "kernel" and _on_tpu() and m <= _PALLAS_MAX_ROWS:
        return dequant_matmul_4bit(x, packed, absmax, quant_type=quant_type)
    w = _dequant_dense(packed, absmax, quant_type, shape, x.dtype, layout)
    return x @ w.T


def _dequant_dense(packed, absmax, quant_type, shape, dtype, layout):
    if layout == "kernel":
        return _dequant_deint(packed, absmax, quant_type, shape, dtype)
    return dequantize_4bit(
        packed,
        QuantState4bit(absmax, shape, BLOCK, quant_type, "float32"),
        dtype=dtype,
    )


def _q4_fwd(x, packed, absmax, quant_type, shape, layout):
    return _q4_matmul(x, packed, absmax, quant_type, shape, layout), (
        x, packed, absmax,
    )


def _q4_bwd(quant_type, shape, layout, res, g):
    x, packed, absmax = res
    w = _dequant_dense(packed, absmax, quant_type, shape, g.dtype, layout)
    return g @ w, None, None


_q4_matmul.defvjp(_q4_fwd, _q4_bwd)


class QuantLinear4bit(nnx.Module):
    """NF4/FP4 weight-only linear (bnb Linear4bit analog)."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        quant_type: str = "nf4",
        blocksize: int = BLOCK,
    ):
        assert blocksize == BLOCK, "only the bnb default blocksize=64 is supported"
        self.in_features = in_features
        self.out_features = out_features
        self.quant_type = quant_type
        self.blocksize = BLOCK
        self.layout = (
            "kernel" if kernel_supported(in_features, out_features) else "flat"
        )
        n = out_features * in_features
        if self.layout == "kernel":
            self.packed = QuantParam(
                jnp.zeros((in_features // 2, out_features), dtype=jnp.uint8)
            )
            self.absmax = QuantParam(
                jnp.zeros((in_features // BLOCK, out_features), dtype=jnp.float32)
            )
        else:
            self.packed = QuantParam(jnp.zeros((n // 2, 1), dtype=jnp.uint8))
            self.absmax = QuantParam(
                jnp.zeros((-(-n // BLOCK),), dtype=jnp.float32)
            )
        self.bias = (
            nnx.Param(jnp.zeros((out_features,), dtype=jnp.float32))
            if use_bias else None
        )

    # for LoRA wrapping: expose a kernel-shaped accessor
    @property
    def kernel_shape(self) -> tuple[int, int]:
        return (self.in_features, self.out_features)

    def _set_from_bnb(self, packed_bnb: np.ndarray, absmax_flat: np.ndarray):
        shape = (self.out_features, self.in_features)
        packed_bnb = np.asarray(packed_bnb, dtype=np.uint8).reshape(-1, 1)
        absmax_flat = np.asarray(absmax_flat, dtype=np.float32).reshape(-1)
        if self.layout == "kernel":
            self.packed.value = jnp.asarray(
                repack_deinterleaved(packed_bnb, shape)
            )
            self.absmax.value = jnp.asarray(
                np.ascontiguousarray(
                    absmax_flat.reshape(
                        self.out_features, self.in_features // BLOCK
                    ).T
                )
            )
        else:
            self.packed.value = jnp.asarray(packed_bnb)
            self.absmax.value = jnp.asarray(absmax_flat)

    def _get_bnb(self) -> tuple[np.ndarray, np.ndarray]:
        if self.layout == "kernel":
            packed = repack_bnb(np.asarray(self.packed.value))
            absmax = np.asarray(self.absmax.value).T.reshape(-1)
        else:
            packed = np.asarray(self.packed.value)
            absmax = np.asarray(self.absmax.value)
        return packed, absmax

    @classmethod
    def from_linear(cls, linear: nnx.Linear, quant_type: str = "nf4",
                    blocksize: int = BLOCK) -> "QuantLinear4bit":
        kernel = linear.kernel.value  # (in, out)
        module = cls(
            in_features=kernel.shape[0],
            out_features=kernel.shape[1],
            use_bias=linear.bias is not None,
            quant_type=quant_type,
        )
        if isinstance(kernel, jax.Array) and module.layout == "kernel":
            # all-device fast path straight into the kernel layout — no host
            # round trip (the single-core host takes minutes per big layer)
            from .nf4 import quantize_4bit_device_kernel_layout

            packed_deint, absmax = quantize_4bit_device_kernel_layout(
                jnp.transpose(kernel), quant_type, blocksize
            )
            module.packed.value = packed_deint
            module.absmax.value = absmax
        elif isinstance(kernel, jax.Array):
            from .nf4 import quantize_4bit_device

            packed, state = quantize_4bit_device(
                jnp.transpose(kernel), blocksize, quant_type
            )
            module._set_from_bnb(packed, state.absmax)
        else:
            w_torch = np.asarray(kernel).T  # (out, in) row-major, bnb layout
            packed, state = quantize_4bit(w_torch, blocksize, quant_type)
            module._set_from_bnb(packed, state.absmax)
        if linear.bias is not None:
            module.bias = nnx.Param(linear.bias.value)
        return module

    def load_prequantized(self, packed: np.ndarray,
                          stats: dict[str, np.ndarray],
                          bias: np.ndarray | None = None):
        state = state_from_bnb_dict(stats)
        assert state.shape == (self.out_features, self.in_features), (
            f"quant state shape {state.shape} mismatches layer "
            f"({self.out_features}, {self.in_features})"
        )
        self.quant_type = state.quant_type
        assert state.blocksize == BLOCK, (
            f"unsupported blocksize {state.blocksize}"
        )
        self._set_from_bnb(packed, state.absmax)
        if bias is not None:
            self.bias = nnx.Param(jnp.asarray(bias))

    def export_bnb(self, prefix: str = "") -> dict[str, np.ndarray]:
        """bnb-format tensors for checkpoint export ({prefix}weight + stats)."""
        packed, absmax = self._get_bnb()
        state = QuantState4bit(
            absmax=absmax,
            shape=(self.out_features, self.in_features),
            blocksize=BLOCK,
            quant_type=self.quant_type,
            dtype="float32",
        )
        out = {f"{prefix}weight": packed}
        out.update(state_to_bnb_dict(state, packed_prefix=f"{prefix}weight."))
        if self.bias is not None:
            out[f"{prefix}bias"] = np.asarray(self.bias.value)
        return out

    def dequantized_kernel(self, dtype=jnp.float32) -> jax.Array:
        """(in, out) dense kernel (for merging / debugging)."""
        w = _dequant_dense(
            self.packed.value, self.absmax.value, self.quant_type,
            (self.out_features, self.in_features), dtype, self.layout,
        )
        return w.T

    def __call__(self, x: jax.Array) -> jax.Array:
        y = _q4_matmul(
            x, self.packed.value, self.absmax.value, self.quant_type,
            (self.out_features, self.in_features), self.layout,
        )
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class QuantLinearInt8(nnx.Module):
    """Per-output-channel symmetric int8 weight-only linear (bnb int8 /
    quanto qint8 analog)."""

    def __init__(self, in_features: int, out_features: int,
                 use_bias: bool = True):
        self.in_features = in_features
        self.out_features = out_features
        self.qweight = QuantParam(
            jnp.zeros((out_features, in_features), dtype=jnp.int8)
        )
        self.scale = QuantParam(jnp.ones((out_features,), dtype=jnp.float32))
        self.bias = (
            nnx.Param(jnp.zeros((out_features,), dtype=jnp.float32))
            if use_bias else None
        )

    @property
    def kernel_shape(self) -> tuple[int, int]:
        return (self.in_features, self.out_features)

    @classmethod
    def from_linear(cls, linear: nnx.Linear) -> "QuantLinearInt8":
        kernel = np.asarray(linear.kernel.value)  # (in, out)
        w = kernel.T.astype(np.float32)
        scale = np.abs(w).max(axis=1) / 127.0
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(w / scale[:, None]), -127, 127).astype(np.int8)
        module = cls(kernel.shape[0], kernel.shape[1],
                     use_bias=linear.bias is not None)
        module.qweight.value = jnp.asarray(q)
        module.scale.value = jnp.asarray(scale)
        if linear.bias is not None:
            module.bias = nnx.Param(linear.bias.value)
        return module

    def __call__(self, x: jax.Array) -> jax.Array:
        w = (
            self.qweight.value.astype(jnp.float32)
            * self.scale.value[:, None]
        ).astype(x.dtype)
        y = x @ jax.lax.stop_gradient(w).T
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class QuantLinearFP8(nnx.Module):
    """fp8_e4m3 weight storage with per-tensor scale (XLA-native fp8 dtype)."""

    def __init__(self, in_features: int, out_features: int,
                 use_bias: bool = True):
        self.in_features = in_features
        self.out_features = out_features
        self.qweight = QuantParam(
            jnp.zeros((in_features, out_features), dtype=jnp.float8_e4m3fn)
        )
        self.scale = QuantParam(jnp.ones((), dtype=jnp.float32))
        self.bias = (
            nnx.Param(jnp.zeros((out_features,), dtype=jnp.float32))
            if use_bias else None
        )

    @property
    def kernel_shape(self) -> tuple[int, int]:
        return (self.in_features, self.out_features)

    @classmethod
    def from_linear(cls, linear: nnx.Linear) -> "QuantLinearFP8":
        kernel = np.asarray(linear.kernel.value, dtype=np.float32)
        scale = max(float(np.abs(kernel).max()) / 448.0, 1e-12)
        module = cls(kernel.shape[0], kernel.shape[1],
                     use_bias=linear.bias is not None)
        module.qweight.value = jnp.asarray(
            kernel / scale, dtype=jnp.float8_e4m3fn
        )
        module.scale.value = jnp.asarray(scale)
        if linear.bias is not None:
            module.bias = nnx.Param(linear.bias.value)
        return module

    def __call__(self, x: jax.Array) -> jax.Array:
        w = (
            self.qweight.value.astype(jnp.float32) * self.scale.value
        ).astype(x.dtype)
        y = x @ jax.lax.stop_gradient(w)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y
