"""Pallas fused NF4/FP4 dequant-matmul for TPU.

The QLoRA hot path is memory-bound: the win is reading 4-bit weights from HBM
and dequantizing in VMEM right before the MXU, never materializing the dense
matrix in HBM.

Mosaic constraints shape the design (probed on v5e: lane-dim reshapes,
elementwise repeats and stack-interleaves all fail to lower; static lane
slices work):
- codes are stored **deinterleaved** on the host: byte (o, c) holds the code
  of original column c in its high nibble and column c + in/2 in its low
  nibble, so the kernel only ever takes static 64-column slices;
- dequant uses a 16-way select tree (no gathers on the VPU); the tree must
  select in f32 — running it in bf16 trips a Mosaic "invalid relayout" on
  the i1 masks ((8,128) -> (16,128) native tiling, probed on v5e);
- blockwise absmax scaling happens on the (bm, bo) partial products after
  each 64-column contraction — mathematically identical to scaling W, but it
  needs no lane-dim expansion of the scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nf4 import CODEBOOKS, unpack_4bit

BLOCK = 64  # bnb absmax blocksize; also the per-chunk contraction width


def repack_deinterleaved(packed_bnb: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """bnb pair-packed (n//2, 1) -> kernel layout (out, in//2) uint8 where
    high nibbles are columns [0, in/2) and low nibbles columns [in/2, in)."""
    out_dim, in_dim = shape
    codes = unpack_4bit(packed_bnb).reshape(out_dim, in_dim)
    left = codes[:, : in_dim // 2]
    right = codes[:, in_dim // 2 :]
    return ((left << 4) | right).astype(np.uint8)


def repack_bnb(deint: np.ndarray) -> np.ndarray:
    """Inverse of :func:`repack_deinterleaved` -> (n//2, 1) uint8."""
    out_dim, half = deint.shape
    codes = np.empty((out_dim, half * 2), dtype=np.uint8)
    codes[:, :half] = deint >> 4
    codes[:, half:] = deint & 0x0F
    flat = codes.reshape(-1)
    return ((flat[0::2] << 4) | flat[1::2]).reshape(-1, 1)


def _lut16(q: jax.Array, code: np.ndarray) -> jax.Array:
    """16-entry lookup as a bit-recursive select tree (VPU-friendly, no
    gather). Selecting on the code's BITS needs 4 mask extractions + 15
    selects (~19 VPU ops/weight) vs the naive equality chain's 15 compares
    + 15 selects (~30) — the kernel is VPU-dequant-bound, so this is a
    direct throughput win."""
    bits = [(q & (1 << b)) != 0 for b in range(4)]
    # leaves -> root: start with 8 selects between constant pairs on bit 0
    level = [
        jnp.where(bits[0], code[2 * i + 1], code[2 * i]).astype(jnp.float32)
        for i in range(8)
    ]
    for b in range(1, 4):
        level = [
            jnp.where(bits[b], level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
    return level[0]


def _dequant_matmul_kernel(
    x_ref,  # (bm, in)
    packed_ref,  # (bo, in//2) uint8, deinterleaved
    absmax_t_ref,  # (in//BLOCK, bo) f32 (transposed for row slicing)
    out_ref,  # (bm, bo)
    *,
    code: np.ndarray,
    in_dim: int,
):
    p = packed_ref[...].astype(jnp.int32)
    nb = in_dim // BLOCK
    half_nb = nb // 2
    bm = x_ref.shape[0]
    bo = packed_ref.shape[0]
    acc = jnp.zeros((bm, bo), dtype=jnp.float32)
    for j in range(nb):
        if j < half_nb:
            codes = (p[:, j * BLOCK : (j + 1) * BLOCK] >> 4) & 0x0F
        else:
            jj = j - half_nb
            codes = p[:, jj * BLOCK : (jj + 1) * BLOCK] & 0x0F
        w = _lut16(codes, code)  # (bo, BLOCK) f32
        x_chunk = x_ref[:, j * BLOCK : (j + 1) * BLOCK]
        partial = jax.lax.dot_general(
            x_chunk,
            w.astype(x_chunk.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + partial * absmax_t_ref[j : j + 1, :]
    out_ref[...] = acc.astype(out_ref.dtype)


def _pick_block(n: int, target: int, multiple: int) -> int:
    b = min(n, target)
    b -= b % multiple
    return max(b, min(n, multiple))


def kernel_supported(in_dim: int, out_dim: int) -> bool:
    return in_dim % (2 * BLOCK) == 0 and out_dim % 8 == 0


@functools.partial(jax.jit, static_argnames=("quant_type", "interpret"))
def dequant_matmul_4bit(
    x: jax.Array,  # (..., in)
    packed_deint: jax.Array,  # (out, in//2) uint8 (deinterleaved layout)
    absmax: jax.Array,  # (out, in//BLOCK) f32
    quant_type: str = "nf4",
    interpret: bool = False,
) -> jax.Array:
    """y[..., out] = x @ dequant(W).T"""
    code = CODEBOOKS[quant_type]
    lead = x.shape[:-1]
    in_dim = x.shape[-1]
    out_dim = packed_deint.shape[0]
    x2 = x.reshape(-1, in_dim)
    m = x2.shape[0]

    block_m = _pick_block(m, 256, 8)
    block_o = _pick_block(out_dim, 512, 8)
    pad_m = (-m) % block_m
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    pad_o = (-out_dim) % block_o
    if pad_o:
        packed_deint = jnp.pad(packed_deint, ((0, pad_o), (0, 0)))
        absmax = jnp.pad(absmax, ((0, pad_o), (0, 0)))

    absmax_t = absmax.astype(jnp.float32).T  # (in//BLOCK, out)

    grid = (x2.shape[0] // block_m, packed_deint.shape[0] // block_o)
    y = pl.pallas_call(
        functools.partial(_dequant_matmul_kernel, code=code, in_dim=in_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, in_dim), lambda i, j: (i, 0)),
            pl.BlockSpec((block_o, in_dim // 2), lambda i, j: (j, 0)),
            pl.BlockSpec((in_dim // BLOCK, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (x2.shape[0], packed_deint.shape[0]), x.dtype
        ),
        interpret=interpret,
    )(x2, packed_deint, absmax_t)
    if pad_m or pad_o:
        y = y[:m, :out_dim]
    return y.reshape(*lead, out_dim)
