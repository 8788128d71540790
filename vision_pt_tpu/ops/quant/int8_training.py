"""Dynamic int8 quantized-training matmul (AQT-style) for the v5e MXU.

The v5e multiplies int8 at ~2x the bf16 MACs/s. This module quantizes BOTH
operands on the fly (per-row activation scales, per-column weight scales),
runs the contraction in int8 -> int32, and dequantizes the product — a
straight-through estimator supplies bf16 gradients w.r.t. the ORIGINAL
values. Master weights, optimizer state and the backward pass stay in
bf16/fp32, so this is a drop-in throughput lever for the matmul-bound
share of a train step (opt-in: quality must be validated per workload;
see tests/training/test_int8_training_quality.py).

No reference analog: the torch reference only does weight-only
quantized INFERENCE (bitsandbytes/quanto, ``src/modules/quant``), never
quantized training compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def _rowwise_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: returns (q, scale[..., 1])."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = x @ w with the forward contraction in int8 (x: (..., K), w: (K, N)).

    Forward: dynamic symmetric quantization — x per row, w per output
    column — int8 dot with int32 accumulation, rescale by sx * sw.
    Backward: straight-through (grads of the unquantized matmul, bf16).
    """
    return _int8_matmul_fwd(x, w)[0]


def _int8_matmul_fwd(x, w):
    xq, sx = _rowwise_quant(x)
    wq_t, sw = _rowwise_quant(w.T)  # per-output-column scales
    y = jax.lax.dot_general(
        xq, wq_t.T, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * sw[:, 0][None, :]
    return y.astype(x.dtype), (x, w)


def _int8_matmul_bwd(res, g):
    x, w = res
    gx = jnp.matmul(g, w.T.astype(g.dtype)).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    gw = jnp.matmul(x2.T.astype(g.dtype), g2).astype(w.dtype)
    return gx, gw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


class Int8TrainLinear(nnx.Linear):
    """nnx.Linear whose forward contraction runs in int8 (same params, same
    checkpoint layout — only the compute path changes)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.kernel.value
        if self.dtype is not None:  # nnx.Linear's compute-dtype promotion
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        lead = x.shape[:-1]
        y = int8_matmul(x.reshape(-1, x.shape[-1]), kernel)
        y = y.reshape(*lead, kernel.shape[-1])
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


def quantize_training_inplace(
    model: nnx.Module,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
) -> int:
    """Swap matching nnx.Linear modules to Int8TrainLinear IN PLACE (the
    params are shared, only the class changes). Returns the swap count."""
    from ...peft.functional import iter_named_modules

    include_keys = include_keys if include_keys is not None else [""]
    exclude_keys = exclude_keys or []
    n = 0
    for path, mod in list(iter_named_modules(model)):
        for name, child in list(vars(mod).items()):
            if type(child) is not nnx.Linear:
                continue
            full = f"{path}.{name}" if path else name
            if not any(k in full for k in include_keys):
                continue
            if any(k in full for k in exclude_keys):
                continue
            child.__class__ = Int8TrainLinear
            n += 1
    return n
