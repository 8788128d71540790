"""Pallas fused NF4/FP4 dequant-matmul for TPU.

The QLoRA hot path is memory-bound: the win is reading 4-bit weights from HBM
and dequantizing in VMEM right before the MXU, never materializing the dense
matrix in HBM. Replaces the reference's bitsandbytes CUDA kernels
(``/root/reference/src/modules/quant/bnb.py:37-129``).

Mosaic constraints shape the design (all probed on this chip):
- weights are stored **transposed + deinterleaved**: byte (r, o) holds the
  code of input row r in its high nibble and input row r + in/2 in its low
  nibble, for output column o. The (K, N) orientation lets every dot be a
  natural NN contraction and every slice a static sublane slice.
- dequant uses a 16-way select tree (hardware gathers do not lower: 1D
  ``jnp.take`` and all 2D ``take_along_axis`` forms fail Mosaic lowering,
  probed). For bf16 activations the tree selects between int16 *bit
  patterns* of the bf16 codebook values and bitcasts once at the end —
  int16 ops run on the native 16-bit (16, 128) tiling. The nibble is never
  right-shifted: ``int16 >> 4`` crashes the Mosaic compiler (probed), so
  the tree selects directly on the high-nibble bit masks (16/32/64/128).
- blockwise absmax scaling happens on the (bm, bo) partial products after
  each 64-row contraction — mathematically identical to scaling W, but it
  needs no lane-dim expansion of the scales and keeps the tree output a
  pure codebook lookup. The tree's selected bf16 code values are bit-exact
  vs the XLA reference's codebook, but the *matmul* result can differ by
  bf16 rounding: the kernel scales f32 partial products after a
  bf16-codebook dot while the XLA path rounds code*scale to bf16 before
  its dot, so products accumulate in different orders (tests assert 5e-2
  relative agreement, not bit equality).

Measured on the round-4 chip (M=64, K=N=8192, amortized harness): this
design runs 0.92x dense bf16 vs the previous (N, K/2) f32-tree kernel's
0.79x. The remaining gap to >1x is a VPU roofline, not a schedule problem:
the select tree costs ~19 VPU ops/weight and measures ~3.6 Tops/s — at the
VPU's throughput ceiling — while the HBM bytes saved by NF4 (~100 MB at
this shape) are worth less wall time than the decode costs. See
``docs/NF4_ROOFLINE.md`` for the full measured analysis.
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
    """bnb pair-packed (n//2, 1) -> kernel layout (in//2, out) uint8 where
    high nibbles are input rows [0, in/2) and low nibbles rows [in/2, in)."""
    out_dim, in_dim = shape
    codes = unpack_4bit(packed_bnb).reshape(out_dim, in_dim)
    left = codes[:, : in_dim // 2]
    right = codes[:, in_dim // 2 :]
    return np.ascontiguousarray(((left << 4) | right).astype(np.uint8).T)


def repack_bnb(deint_t: np.ndarray) -> np.ndarray:
    """Inverse of :func:`repack_deinterleaved` -> (n//2, 1) uint8."""
    deint = deint_t.T  # (out, in//2)
    out_dim, half = deint.shape
    codes = np.empty((out_dim, half * 2), dtype=np.uint8)
    codes[:, :half] = deint >> 4
    codes[:, half:] = deint & 0x0F
    flat = codes.reshape(-1)
    return ((flat[0::2] << 4) | flat[1::2]).reshape(-1, 1)


def _code_i16(code: np.ndarray) -> list[int]:
    """bf16 bit patterns of the codebook as python int16 values."""
    code_u16 = np.asarray(code, np.float32).astype(jnp.bfloat16)
    code_u16 = np.asarray(code_u16).view(np.uint16)
    return [int(v) - 65536 if int(v) >= 32768 else int(v) for v in code_u16]


def _lut16_bf16(q: jax.Array, code_i16: list[int], shift: int) -> jax.Array:
    """16-entry lookup over int16 bf16-bit-patterns as a bit-recursive select
    tree (4 mask tests + 15 selects per weight; VPU-bound and measured at the
    VPU's throughput ceiling). ``shift`` picks the nibble via the mask bits —
    never via ``>>``, which Mosaic cannot compile on int16."""
    bits = [(q & (1 << (shift + b))) != 0 for b in range(4)]
    cst = [jnp.int16(v) for v in code_i16]
    level = [jnp.where(bits[0], cst[2 * i + 1], cst[2 * i]) for i in range(8)]
    for b in range(1, 4):
        level = [
            jnp.where(bits[b], level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
    return jax.lax.bitcast_convert_type(
        level[0].astype(jnp.uint16), jnp.bfloat16
    )


def _lut16_f32(q: jax.Array, code: np.ndarray, shift: int) -> jax.Array:
    """f32 variant for non-bf16 activations: same tree, int32 masks (i1
    layout matches the 32-bit (8, 128) tiling), f32 codebook constants."""
    bits = [(q & (1 << (shift + b))) != 0 for b in range(4)]
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
    packed_t_ref,  # (in//2, bo) uint8, transposed deinterleaved
    absmax_t_ref,  # (in//BLOCK, bo) f32
    out_ref,  # (bm, bo)
    *,
    code: np.ndarray,
    in_dim: int,
    bf16_tree: bool,
):
    if bf16_tree:
        p = packed_t_ref[...].astype(jnp.int16)
        code_i16 = _code_i16(code)
    else:
        p = packed_t_ref[...].astype(jnp.int32)
    nb = in_dim // BLOCK
    half_nb = nb // 2
    bm = x_ref.shape[0]
    bo = packed_t_ref.shape[1]
    acc = jnp.zeros((bm, bo), dtype=jnp.float32)
    for j in range(nb):
        # rows [0, in/2) live in the high nibble, [in/2, in) in the low
        rj = j if j < half_nb else j - half_nb
        shift = 4 if j < half_nb else 0
        chunk = p[rj * BLOCK : (rj + 1) * BLOCK, :]
        if bf16_tree:
            w = _lut16_bf16(chunk, code_i16, shift)  # (BLOCK, bo) bf16
        else:
            w = _lut16_f32(chunk, code, shift)  # (BLOCK, bo) f32
        x_chunk = x_ref[:, j * BLOCK : (j + 1) * BLOCK]
        partial = jax.lax.dot_general(
            x_chunk,
            w.astype(x_chunk.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
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
    packed_t: jax.Array,  # (in//2, out) uint8 (transposed deinterleaved)
    absmax_t: jax.Array,  # (in//BLOCK, out) f32
    quant_type: str = "nf4",
    interpret: bool = False,
) -> jax.Array:
    """y[..., out] = x @ dequant(W).T  (W logically (out, in), stored
    transposed-deinterleaved)."""
    code = CODEBOOKS[quant_type]
    lead = x.shape[:-1]
    in_dim = x.shape[-1]
    out_dim = packed_t.shape[1]
    x2 = x.reshape(-1, in_dim)
    m = x2.shape[0]

    block_m = _pick_block(m, 256, 8)
    block_o = _pick_block(out_dim, 256, 8)
    pad_m = (-m) % block_m
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    pad_o = (-out_dim) % block_o
    if pad_o:
        packed_t = jnp.pad(packed_t, ((0, 0), (0, pad_o)))
        absmax_t = jnp.pad(absmax_t, ((0, 0), (0, pad_o)))

    bf16_tree = x.dtype == jnp.bfloat16
    grid = (x2.shape[0] // block_m, packed_t.shape[1] // block_o)
    y = pl.pallas_call(
        functools.partial(
            _dequant_matmul_kernel, code=code, in_dim=in_dim,
            bf16_tree=bf16_tree,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, in_dim), lambda i, j: (i, 0)),
            pl.BlockSpec((in_dim // 2, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((in_dim // BLOCK, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (x2.shape[0], packed_t.shape[1]), x.dtype
        ),
        interpret=interpret,
    )(x2, packed_t, absmax_t)
    if pad_m or pad_o:
        y = y[:m, :out_dim]
    return y.reshape(*lead, out_dim)
