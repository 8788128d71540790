"""Blockwise 4-bit (NF4/FP4) quantization, bitsandbytes-checkpoint-compatible.

Replaces bitsandbytes' CUDA kernels (reference ``src/modules/quant/bnb.py``):
- packing: two 4-bit codes per uint8, element 2i in the high nibble, over the
  row-major-flattened tensor; packed tensor shaped (n//2, 1)
- absmax per ``blocksize`` block (default 64)
- loading supports double-quantized (compressed) stats because bnb
  checkpoints are self-describing: nested_quant_map/nested_absmax/offset all
  ship in the file; our own saves use uncompressed fp32 absmax (also a valid
  bnb format).

Codebooks are the exact bnb constants so dequantized weights match
bit-for-bit.
"""

from __future__ import annotations

import functools
import json
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

# e2m1 values {0, 0.0625, 8, 12, 4, 6, 2, 3}/12, sign in bit 3 (bnb order)
_FP4_POS = np.array([0.0, 0.0625, 8.0, 12.0, 4.0, 6.0, 2.0, 3.0]) / 12.0
FP4_CODE = np.concatenate([_FP4_POS, -_FP4_POS]).astype(np.float32)

CODEBOOKS = {"nf4": NF4_CODE, "fp4": FP4_CODE}


def _nearest_code_indices(values: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Index of the nearest codebook entry per value (ties -> lowest index,
    matching argmin semantics). Codebook may be unsorted (FP4)."""
    order = np.argsort(code, kind="stable")
    sorted_code = code[order]
    mids = (sorted_code[1:] + sorted_code[:-1]) * 0.5
    pos = np.searchsorted(mids, values, side="left")
    # searchsorted against midpoints can land one off at exact boundaries;
    # compare the two candidates explicitly
    lo = np.clip(pos, 0, len(code) - 1)
    hi = np.clip(pos + 1, 0, len(code) - 1)
    pick_hi = np.abs(sorted_code[hi] - values) < np.abs(sorted_code[lo] - values)
    chosen = np.where(pick_hi, hi, lo)
    return order[chosen].astype(np.uint8)


class QuantState4bit(NamedTuple):
    absmax: np.ndarray  # (num_blocks,) float32 (after de-nesting)
    shape: tuple[int, ...]
    blocksize: int
    quant_type: str  # "nf4" | "fp4"
    dtype: str  # original dtype name


def quantize_4bit(
    w: np.ndarray,
    blocksize: int = 64,
    quant_type: str = "nf4",
) -> tuple[np.ndarray, QuantState4bit]:
    """float weights -> (packed uint8 (n//2, 1), state)."""
    code = CODEBOOKS[quant_type]
    shape = tuple(w.shape)
    flat = np.asarray(w, dtype=np.float32).reshape(-1)
    n = flat.size
    assert n % 2 == 0, "4-bit packing requires an even number of elements"
    pad = (-n) % blocksize
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.float32)])
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    safe = np.where(absmax == 0, 1.0, absmax)
    normalized = blocks / safe[:, None]
    # nearest code value via sorted-codebook binary search: O(n log 16) with
    # no (n, 16) broadcast temp (the argmin form took minutes at SDXL scale)
    idx = _nearest_code_indices(normalized.reshape(-1), code)
    q = idx[:n]
    packed = ((q[0::2] << 4) | q[1::2]).reshape(-1, 1)
    state = QuantState4bit(
        absmax=absmax.astype(np.float32),
        shape=shape,
        blocksize=blocksize,
        quant_type=quant_type,
        dtype="float32",
    )
    return packed, state


@jax.jit
def _quantize_4bit_device_nf4(flat: jax.Array) -> tuple[jax.Array, jax.Array]:
    return _quantize_4bit_device_impl(flat, "nf4")


@jax.jit
def _quantize_4bit_device_fp4(flat: jax.Array) -> tuple[jax.Array, jax.Array]:
    return _quantize_4bit_device_impl(flat, "fp4")


def _quantize_4bit_device_impl(flat, quant_type, blocksize: int = 64):
    code_np = CODEBOOKS[quant_type]
    order = np.argsort(code_np, kind="stable")
    sorted_code = code_np[order]
    mids = (sorted_code[1:] + sorted_code[:-1]) * 0.5

    blocks = flat.astype(jnp.float32).reshape(-1, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    safe = jnp.where(absmax == 0, 1.0, absmax)
    v = (blocks / safe[:, None]).reshape(-1)
    # 15 unrolled comparisons: no (n, 16) temp, fuses into one pass
    pos = jnp.zeros(v.shape, dtype=jnp.uint8)
    for m in mids:
        pos = pos + (v > float(m)).astype(jnp.uint8)
    lo = pos.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, len(code_np) - 1)
    sc = jnp.asarray(sorted_code)
    pick_hi = jnp.abs(sc[hi] - v) < jnp.abs(sc[lo] - v)
    chosen = jnp.where(pick_hi, hi, lo)
    q = jnp.asarray(order.astype(np.uint8))[chosen]
    packed = (q[0::2] << 4) | q[1::2]
    return packed, absmax


def quantize_4bit_device(
    w: jax.Array,
    blocksize: int = 64,
    quant_type: str = "nf4",
) -> tuple[np.ndarray, QuantState4bit]:
    """Device-side quantize_4bit: identical output, runs on the accelerator.

    The host here is a single weak core (quantizing an SDXL UNet took
    minutes in NumPy); on the chip it is one fused elementwise pass plus an
    n/2-byte fetch.
    """
    assert blocksize == 64
    shape = tuple(int(s) for s in w.shape)
    n = int(np.prod(shape))
    assert n % 2 == 0
    flat = jnp.reshape(w, (-1,))
    pad = (-n) % blocksize
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, dtype=flat.dtype)])
    fn = (_quantize_4bit_device_nf4 if quant_type == "nf4"
          else _quantize_4bit_device_fp4)
    packed, absmax = fn(flat)
    packed = np.asarray(packed[: n // 2]).reshape(-1, 1)
    state = QuantState4bit(
        absmax=np.asarray(absmax, dtype=np.float32),
        shape=shape,
        blocksize=blocksize,
        quant_type=quant_type,
        dtype="float32",
    )
    return packed, state


@functools.partial(jax.jit, static_argnames=("quant_type", "blocksize"))
def quantize_4bit_device_kernel_layout(
    w: jax.Array,  # (out, in)
    quant_type: str = "nf4",
    blocksize: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Quantize straight into the Pallas kernel's transposed deinterleaved
    layout — (in//2, out) packed uint8 + (in//blocksize, out) absmax —
    entirely on device (no host round trip; this is the QLoRA model-surgery
    hot path)."""
    out_dim, in_dim = w.shape
    code_np = CODEBOOKS[quant_type]
    order = np.argsort(code_np, kind="stable")
    sorted_code = code_np[order]
    mids = (sorted_code[1:] + sorted_code[:-1]) * 0.5

    blocks = w.astype(jnp.float32).reshape(-1, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    safe = jnp.where(absmax == 0, 1.0, absmax)
    v = (blocks / safe[:, None]).reshape(out_dim, in_dim)
    pos = jnp.zeros(v.shape, dtype=jnp.uint8)
    for m in mids:
        pos = pos + (v > float(m)).astype(jnp.uint8)
    lo = pos.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, len(code_np) - 1)
    sc = jnp.asarray(sorted_code)
    pick_hi = jnp.abs(sc[hi] - v) < jnp.abs(sc[lo] - v)
    q = jnp.asarray(order.astype(np.uint8))[jnp.where(pick_hi, hi, lo)]
    left = q[:, : in_dim // 2]
    right = q[:, in_dim // 2 :]
    packed_t = ((left << 4) | right).astype(jnp.uint8).T  # (in//2, out)
    return packed_t, absmax.reshape(out_dim, in_dim // blocksize).T


def unpack_4bit(packed: np.ndarray) -> np.ndarray:
    flat = np.asarray(packed).reshape(-1)
    out = np.empty(flat.size * 2, dtype=np.uint8)
    out[0::2] = flat >> 4
    out[1::2] = flat & 0x0F
    return out


def dequantize_4bit(
    packed: np.ndarray | jax.Array,
    state: QuantState4bit,
    dtype=jnp.float32,
) -> jax.Array:
    """Packed codes + state -> dense weights (jnp; jit-safe)."""
    code = jnp.asarray(CODEBOOKS[state.quant_type])
    flat = jnp.asarray(packed, dtype=jnp.uint8).reshape(-1)
    high = flat >> 4
    low = flat & 0x0F
    q = jnp.stack([high, low], axis=1).reshape(-1)
    values = code[q]
    n = int(np.prod(state.shape))
    pad = (-n) % state.blocksize
    if pad:
        values = jnp.concatenate([values, jnp.zeros(pad, dtype=values.dtype)])
    blocks = values.reshape(-1, state.blocksize)
    absmax = jnp.asarray(state.absmax, dtype=jnp.float32)
    dense = (blocks * absmax[:, None]).reshape(-1)[:n]
    return dense.reshape(state.shape).astype(dtype)


# ------------------------------------------------- bnb state (de)serialization


def state_to_bnb_dict(
    state: QuantState4bit, packed_prefix: str = ""
) -> dict[str, np.ndarray]:
    """Uncompressed bnb-format stat tensors (valid Params4bit input)."""
    meta = {
        "blocksize": state.blocksize,
        "dtype": state.dtype,
        "shape": list(state.shape),
        "quant_type": state.quant_type,
    }
    meta_bytes = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    ).copy()
    p = packed_prefix
    return {
        f"{p}absmax": state.absmax,
        f"{p}quant_map": CODEBOOKS[state.quant_type].copy(),
        f"{p}quant_state.bitsandbytes__{state.quant_type}": meta_bytes,
    }


def state_from_bnb_dict(stats: dict[str, np.ndarray]) -> QuantState4bit:
    """Parse bnb quantized_stats (compressed or not) into a flat state."""
    qs_key = next(k for k in stats if "quant_state.bitsandbytes__" in k)
    quant_type = qs_key.split("bitsandbytes__")[-1]
    meta = json.loads(bytes(np.asarray(stats[qs_key], dtype=np.uint8)))
    absmax = np.asarray(stats["absmax"])
    if "nested_absmax" in stats:
        # double-quantized stats: de-nest using the shipped maps
        nested_absmax = np.asarray(stats["nested_absmax"], dtype=np.float32)
        nested_map = np.asarray(stats["nested_quant_map"], dtype=np.float32)
        nested_blocksize = int(meta.get("nested_blocksize", 256))
        offset = float(meta.get("nested_offset", 0.0))
        codes = absmax.astype(np.int32).reshape(-1)
        vals = nested_map[codes]
        nblocks = -(-vals.size // nested_blocksize)
        padded = np.zeros(nblocks * nested_blocksize, dtype=np.float32)
        padded[: vals.size] = vals
        denested = (
            padded.reshape(nblocks, nested_blocksize)
            * nested_absmax[:nblocks, None]
        ).reshape(-1)[: vals.size] + offset
        absmax = denested
    return QuantState4bit(
        absmax=absmax.astype(np.float32),
        shape=tuple(meta["shape"]),
        blocksize=int(meta["blocksize"]),
        quant_type=quant_type,
        dtype=str(meta.get("dtype", "float32")),
    )
