"""One-pass Pallas attention for SHORT sequences (S <= ~768).

At DiT-scale sequence lengths (~300 tokens for 256^2 patch-16) the whole
(S, S) score matrix fits in VMEM, so neither the forward nor the backward
ever writes an S x S tensor to HBM — the dominant cost of both the XLA
O(S^2) path (fp32 softmax-weight residuals, ~273 MB/layer at B=64) and the
blockwise flash kernel (whose block padding wastes 40%+ MXU work at these
lengths). Grid is (B, H); each program computes one head's attention
entirely on-chip.

Dispatch: `ops.attention.dot_product_attention` picks this kernel on TPU for
mask-free / kv_lens inputs with S <= MAX_SHORT_SEQ; flash handles S >= 1024;
XLA covers everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
MAX_SHORT_SEQ = 768  # (S,S) f32 x ~3 live must fit VMEM (~16 MB/core)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ forward


def _fwd_kernel(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, sq, sk):
    b = pl.program_id(0)
    o = _head_fwd(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                  kv_lens_ref[b], scale)
    o_ref[0, 0] = o.astype(o_ref.dtype)


# ----------------------------------------------------------------- backward


def _bwd_kernel(kv_lens_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, sq, sk):
    b = pl.program_id(0)
    dq, dk, dv = _head_bwd(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
        kv_lens_ref[b], scale,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ------------------------------------------------- all-heads-per-program


LOG2E = 1.4426950408889634  # exp(x) = exp2(x * log2 e); exp2 is the VPU's
# native transcendental, so folding log2e into the (free) score scale saves
# the per-element multiply inside every exp on the (S, S) tile.

# Bounded-logits fast path: with QKNorm + RoPE the logits are provably
# bounded (|s| <= scale * ||q_hat|| * ||k_hat|| = sqrt(D) * |g_q| * |g_k|,
# rotations preserve norms), so the softmax max-subtraction — a full lane
# reduction + broadcast subtract over the (S, S) tile, measured ~240 us/layer
# at JiT-B headline shape, the single largest VPU cost in this kernel — is
# unnecessary. A defensive clip at +/-BOUNDED_LOGIT_CLIP keeps exp2 finite
# (2^{60*log2e} ~ 2^86 << f32 max) and the denominator nonzero
# (2^{-86} >> f32 min normal) even if learned gains grow pathologically;
# inside the clip range the math is exactly softmax.
BOUNDED_LOGIT_CLIP = 60.0


def _head_fwd(q, k, v, kv_len, scale, bounded=False):
    # Native-dtype (bf16) MXU dots with f32 accumulation, f32 softmax on the
    # VPU — the flash kernel's convention. Casting q/k to f32 first would
    # quarter the MXU rate for zero useful precision (inputs are bf16).
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * LOG2E)  # (Sq, Sk) f32, exp2 domain
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if bounded:
        lim = BOUNDED_LOGIT_CLIP * LOG2E
        e = jnp.exp2(jnp.clip(s, -lim, lim))
        e = jnp.where(col < kv_len, e, 0.0)
    else:
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
    # kv_len == 0 masks every e to 0: clamp so the row degrades to a finite
    # zero output instead of 0/0 NaN (the unbounded path's exp2(s - m) keeps
    # denom >= 1 by construction, but the bounded path has no such floor)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 2.0**-100)
    # lazy normalization: divide the (Sq, D) output by the row sums instead
    # of the (Sq, Sk) probability tile — Sk/D x fewer VPU divides
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return o / denom


def _head_bwd(q, k, v, do, kv_len, scale, bounded=False):
    """One head's full attention backward, (S, S) resident in registers/VMEM.
    Probability/delta math in f32; every MXU dot takes native-dtype operands
    with f32 accumulation (p/ds cast back down like the flash kernel's
    ``p.astype(v.dtype)`` / ``ds.astype(k.dtype)``).

    Unlike the forward, this keeps the materialized p = e / denom tile:
    factoring 1/denom onto the (S, D) dot operands (lazy normalization) was
    measured SLOWER here (+90 us/layer at the JiT-B headline shape) — the
    extra per-operand casts and row-scales outweigh the saved (S, S) divide
    when five dots already consume the tile. ``bounded`` skips the
    max-subtraction exactly as in the forward (p is exact softmax inside
    BOUNDED_LOGIT_CLIP; f32 headroom: e <= 2^87, denom <= S * 2^87 << 2^128)."""
    if bounded:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        lim = BOUNDED_LOGIT_CLIP * LOG2E
        e = jnp.exp2(jnp.clip(s, -lim, lim))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        e = jnp.where(col < kv_len, e, 0.0)
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
    # same kv_len == 0 floor as the forward (zero grads, not NaN)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 2.0**-100)
    p = e / denom  # (Sq, Sk) f32

    dv = jax.lax.dot_general(  # dv = p^T @ do
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # dp = do @ v^T
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    return dq, dk, dv


def _pairable(heads: int, dim: int) -> bool:
    """Head-PAIRED MXU schedule eligibility: two D<=64 heads fused per dot.

    At D=64 the score dots contract over 64 of the MXU's 128-deep array and
    the output dots write 64 of its 128 lanes — both half idle. Pairing two
    heads with lane-concat queries and block-diagonal keys/values fills
    both: 4 of the 8 fwd+bwd dots drop from 6 to 5 row-stream passes per
    pair (measured 1.11x on the kernel at the JiT-B headline shape —
    tools/bench/attention_pairing_probe.py). Inside fp rounding the math is
    identical: [q_a|q_b] @ [[k_a,0],[0,k_b]]^T = [s_a | s_b] exactly."""
    return heads % 2 == 0 and 2 * dim <= 128


def _head_pair_fwd(q2, k2, v2, kv_len, scale, dim, bounded):
    """Fused attention forward for two heads. q2/k2/v2 are the lane-concat
    (S, 2*dim) slices of the packed block; returns the (Sq, 2*dim) paired
    output. Same numerics as two `_head_fwd` calls (bf16 MXU dots, f32
    softmax, lazy normalization), scheduled as paired dots."""
    sq, sk = q2.shape[0], k2.shape[0]
    z = jnp.zeros((sk, dim), k2.dtype)
    # block-diagonal keys/values: [[k_a, 0], [0, k_b]]  (2*Sk, 2*dim)
    kblk = jnp.concatenate(
        [jnp.concatenate([k2[:, :dim], z], 1),
         jnp.concatenate([z, k2[:, dim:]], 1)], 0)
    vblk = jnp.concatenate(
        [jnp.concatenate([v2[:, :dim], z], 1),
         jnp.concatenate([z, v2[:, dim:]], 1)], 0)
    s = jax.lax.dot_general(  # (Sq, 2*Sk) = [s_a | s_b], depth 2*dim
        q2, kblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * LOG2E)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    first = col < sk
    half_col = jnp.where(first, col, col - sk)
    valid = half_col < kv_len
    if bounded:
        lim = BOUNDED_LOGIT_CLIP * LOG2E
        e = jnp.exp2(jnp.clip(s, -lim, lim))
        e = jnp.where(valid, e, 0.0)
    else:
        s = jnp.where(valid, s, NEG_INF)
        # segmented max per head half (rows never mix heads, columns do)
        ma = jnp.max(jnp.where(first, s, NEG_INF), axis=-1, keepdims=True)
        mb = jnp.max(jnp.where(first, NEG_INF, s), axis=-1, keepdims=True)
        e = jnp.exp2(s - jnp.where(first, ma, mb))
    ea = jnp.where(first, e, 0.0)
    da = jnp.maximum(jnp.sum(ea, axis=-1, keepdims=True), 2.0**-100)
    db = jnp.maximum(jnp.sum(e - ea, axis=-1, keepdims=True), 2.0**-100)
    o = jax.lax.dot_general(  # (Sq, 2*dim) = [o_a | o_b], depth 2*Sk
        e.astype(v2.dtype), vblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.concatenate([o[:, :dim] / da, o[:, dim:] / db], 1)


def _head_pair_bwd(q2, k2, v2, do2, kv_len, scale, dim, bounded):
    """Fused backward for two heads: returns (dq2, dk2, dv2) lane-concat
    (S, 2*dim) grads. dK/dV come out of single (2*Sk, 2*dim) dots whose
    off-diagonal halves are discarded (same MXU cost as per-head, one
    instruction instead of two); the other four dots run at full depth/lanes."""
    sq, sk = q2.shape[0], k2.shape[0]
    z = jnp.zeros((sk, dim), k2.dtype)
    kblk = jnp.concatenate(
        [jnp.concatenate([k2[:, :dim], z], 1),
         jnp.concatenate([z, k2[:, dim:]], 1)], 0)
    vblk = jnp.concatenate(
        [jnp.concatenate([v2[:, :dim], z], 1),
         jnp.concatenate([z, v2[:, dim:]], 1)], 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, 2 * sk), 1)
    first = col < sk
    half_col = jnp.where(first, col, col - sk)
    valid = half_col < kv_len
    if bounded:
        s = jax.lax.dot_general(
            q2, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        lim = BOUNDED_LOGIT_CLIP * LOG2E
        e = jnp.exp2(jnp.clip(s, -lim, lim))
        e = jnp.where(valid, e, 0.0)
    else:
        s = jax.lax.dot_general(
            q2, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid, s, NEG_INF)
        ma = jnp.max(jnp.where(first, s, NEG_INF), axis=-1, keepdims=True)
        mb = jnp.max(jnp.where(first, NEG_INF, s), axis=-1, keepdims=True)
        e = jnp.exp(s - jnp.where(first, ma, mb))
    ea = jnp.where(first, e, 0.0)
    da = jnp.maximum(jnp.sum(ea, axis=-1, keepdims=True), 2.0**-100)
    db = jnp.maximum(jnp.sum(e - ea, axis=-1, keepdims=True), 2.0**-100)
    p = e / jnp.where(first, da, db)  # (Sq, 2*Sk) f32
    dvkj = jax.lax.dot_general(  # (2*Sk, 2*dim): dv_a at [:Sk,:dim], dv_b
        p.astype(do2.dtype), do2, (((0,), (0,)), ((), ())),  # at [Sk:,dim:]
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # (Sq, 2*Sk), depth 2*dim
        do2, vblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pdp = p * dp
    pa = jnp.where(first, pdp, 0.0)
    delta_a = jnp.sum(pa, axis=-1, keepdims=True)
    delta_b = jnp.sum(pdp - pa, axis=-1, keepdims=True)
    ds = (p * (dp - jnp.where(first, delta_a, delta_b)))
    dq = jax.lax.dot_general(  # (Sq, 2*dim), depth 2*Sk
        ds.astype(k2.dtype), kblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dkj = jax.lax.dot_general(  # (2*Sk, 2*dim): dk_a at [:Sk,:dim], dk_b
        ds.astype(q2.dtype), q2, (((0,), (0,)), ((), ())),  # at [Sk:,dim:]
        preferred_element_type=jnp.float32,
    ) * scale
    dk2 = jnp.concatenate([dkj[:sk, :dim], dkj[sk:, dim:]], 1)
    dv2 = jnp.concatenate([dvkj[:sk, :dim], dvkj[sk:, dim:]], 1)
    return dq, dk2, dv2


def _fwd_kernel_ah(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    """One program per BATCH element; heads unrolled inside. 12x fewer grid
    steps than the (B, H) kernel — the per-instance DMA/loop overhead was
    the dominant cost at (S, D) = (304, 64) blocks."""
    b = pl.program_id(0)
    kv_len = kv_lens_ref[b]
    for h in range(heads):
        o = _head_fwd(q_ref[0, h], k_ref[0, h], v_ref[0, h], kv_len, scale)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel_ah(kv_lens_ref, q_ref, k_ref, v_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, scale, heads):
    b = pl.program_id(0)
    kv_len = kv_lens_ref[b]
    for h in range(heads):
        dq, dk, dv = _head_bwd(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], do_ref[0, h],
            kv_len, scale,
        )
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _run_fwd_ah(q_bhsd, k_bhsd, v_bhsd, kv_lens, scale, interpret):
    batch, heads, sq, dim = q_bhsd.shape
    sk = k_bhsd.shape[2]
    qspec = pl.BlockSpec((1, heads, sq, dim), lambda b: (b, 0, 0, 0))
    kspec = pl.BlockSpec((1, heads, sk, dim), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_ah, scale=scale, heads=heads),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q_bhsd.shape, q_bhsd.dtype),
        interpret=interpret,
    )(kv_lens, q_bhsd, k_bhsd, v_bhsd)


def _run_bwd_ah(q_bhsd, k_bhsd, v_bhsd, do_bhsd, kv_lens, scale, interpret):
    batch, heads, sq, dim = q_bhsd.shape
    sk = k_bhsd.shape[2]
    qspec = pl.BlockSpec((1, heads, sq, dim), lambda b: (b, 0, 0, 0))
    kspec = pl.BlockSpec((1, heads, sk, dim), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel_ah, scale=scale, heads=heads),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec, qspec,
        ],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct(q_bhsd.shape, q_bhsd.dtype),
            jax.ShapeDtypeStruct(k_bhsd.shape, k_bhsd.dtype),
            jax.ShapeDtypeStruct(v_bhsd.shape, v_bhsd.dtype),
        ],
        interpret=interpret,
    )(kv_lens, q_bhsd, k_bhsd, v_bhsd, do_bhsd)


# ------------------------------------------- packed (B, S, H*D) kernel


def _zero_oob_rows(x, valid):
    """Zero block rows >= valid (static). The packed pallas calls read the
    UNPADDED (B, S, E) arrays through block shapes rounded up to a multiple
    of 8 — Mosaic materializes the overrunning rows, but their contents are
    unspecified (could even be NaN bit patterns, which 0*NaN would propagate
    through the dv/dk contraction over query rows). One static row mask per
    operand restores exactly the semantics of the old host-side jnp.pad,
    minus its ~7 ms/step of HBM round-trips at the JiT-B headline shape."""
    if x.shape[0] == valid:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < valid, x, jnp.zeros((), x.dtype))


def _fwd_kernel_packed(kv_lens_ref, q_ref, k_ref, v_ref, o_ref,
                       *, scale, heads, dim, bounded, sk):
    """Heads live as static 64/128-wide LANE slices of a (S, H*D) block —
    the one head-extraction pattern that is layout-free on both sides: the
    model's (B, S, H, D) tensors collapse to (B, S, H*D) with no data
    movement, and static lane slices lower cleanly on Mosaic (same pattern
    as the NF4 kernel's 64-column chunks)."""
    b = pl.program_id(0)
    # sk < block rows: unspecified OOB k/v rows are masked by the kv_len
    # column mask (kv_len <= sk always), so no explicit zeroing is needed on
    # the key side; garbage q rows only produce garbage o rows, and stores
    # beyond the array bound are dropped.
    kv_len = jnp.minimum(kv_lens_ref[b], sk)
    # v's OOB rows sit behind zeroed e columns, but 0*NaN = NaN inside the
    # e@v contraction would leak into VALID output rows — zero them. k's OOB
    # rows only poison e columns that the post-exp2 where() rewrites to 0,
    # and garbage q rows only produce garbage o rows whose stores the block
    # bound drops, so neither needs zeroing.
    v_blk = _zero_oob_rows(v_ref[0], sk)
    if _pairable(heads, dim):
        for hp in range(heads // 2):
            sl = slice(hp * 2 * dim, (hp + 1) * 2 * dim)
            o = _head_pair_fwd(q_ref[0, :, sl], k_ref[0, :, sl],
                               v_blk[:, sl], kv_len, scale, dim,
                               bounded=bounded)
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
    else:
        for h in range(heads):
            sl = slice(h * dim, (h + 1) * dim)
            o = _head_fwd(q_ref[0, :, sl], k_ref[0, :, sl], v_blk[:, sl],
                          kv_len, scale, bounded=bounded)
            o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(kv_lens_ref, q_ref, k_ref, v_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, heads, dim,
                       bounded, sq, sk):
    b = pl.program_id(0)
    kv_len = jnp.minimum(kv_lens_ref[b], sk)
    # dk/dv contract over QUERY rows (dv = p^T do, dk = ds^T q): garbage
    # q/do rows would corrupt them. k/v OOB rows sit behind zeroed ds/e
    # columns, but 0*NaN = NaN inside the ds@k / do@v^T contractions would
    # leak into valid rows. Zero all overrun rows once per block.
    q_blk = _zero_oob_rows(q_ref[0], sq)
    do_blk = _zero_oob_rows(do_ref[0], sq)
    k_blk = _zero_oob_rows(k_ref[0], sk)
    v_blk = _zero_oob_rows(v_ref[0], sk)
    if _pairable(heads, dim):
        for hp in range(heads // 2):
            sl = slice(hp * 2 * dim, (hp + 1) * 2 * dim)
            dq, dk, dv = _head_pair_bwd(
                q_blk[:, sl], k_blk[:, sl], v_blk[:, sl],
                do_blk[:, sl], kv_len, scale, dim, bounded=bounded,
            )
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
    else:
        for h in range(heads):
            sl = slice(h * dim, (h + 1) * dim)
            dq, dk, dv = _head_bwd(
                q_blk[:, sl], k_blk[:, sl], v_blk[:, sl],
                do_blk[:, sl], kv_len, scale, bounded=bounded,
            )
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _prep_packed(q, k, v, kv_lens):
    batch, sq, _ = q.shape
    sk = k.shape[1]
    if kv_lens is None:
        kv_lens = jnp.full((batch,), sk, dtype=jnp.int32)
    return kv_lens.astype(jnp.int32), sq, sk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7))
def short_attention_packed(q, k, v, num_heads, kv_lens=None, scale=None,
                           interpret=False, bounded=False):
    """(B, S, H*D) attention: zero-relayout entry for BSHD models.

    The caller's (B, S, H, D) q/k/v collapse to (B, S, H*D) for free (minor
    dims merge in memory order), so unlike the BHSD kernels this path never
    pays a head transpose on either side of the pallas call. kv_lens is (B,)
    suffix key padding.

    ``bounded=True`` opts both the forward and the backward into the no-max
    softmax (see BOUNDED_LOGIT_CLIP): only pass it when the caller guarantees
    bounded logits, e.g. QKNorm'd q/k. Inside the clip range the result is
    exactly softmax, and the recomputed p in the backward matches the forward
    bit-for-bit (both take the same clipped-exp2 path).
    """
    out, _ = _packed_fwd(q, k, v, num_heads, kv_lens, scale, interpret,
                         bounded)
    return out


def _packed_fwd(q, k, v, num_heads, kv_lens, scale, interpret, bounded):
    dim = q.shape[-1] // num_heads
    if scale is None:
        scale = dim**-0.5
    lens, sq, sk = _prep_packed(q, k, v, kv_lens)
    batch, _, e = q.shape
    # Block shapes round S up to the sublane multiple; the ARRAYS stay
    # unpadded. Mosaic materializes the overrunning block rows (contents
    # unspecified — see _zero_oob_rows) and drops OOB stores, which replaces
    # the old host-side jnp.pad + depad slice round-trips (~7 ms/step at the
    # JiT-B headline: 48 pad fusions + the bwd depads).
    sq_p, sk_p = _ceil_to(sq, 8), _ceil_to(sk, 8)
    qspec = pl.BlockSpec((1, sq_p, e), lambda b: (b, 0, 0))
    kspec = pl.BlockSpec((1, sk_p, e), lambda b: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, scale=scale, heads=num_heads, dim=dim,
            bounded=bounded, sk=sk,
        ),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(lens, q, k, v)
    return out, (q, k, v, kv_lens)


def _packed_bwd(num_heads, scale, interpret, bounded, res, dout):
    q, k, v, kv_lens = res
    dim = q.shape[-1] // num_heads
    if scale is None:
        scale = dim**-0.5
    lens, sq, sk = _prep_packed(q, k, v, kv_lens)
    batch, _, e = q.shape
    do = dout.astype(q.dtype)
    sq_p, sk_p = _ceil_to(sq, 8), _ceil_to(sk, 8)
    qspec = pl.BlockSpec((1, sq_p, e), lambda b: (b, 0, 0))
    kspec = pl.BlockSpec((1, sk_p, e), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_packed, scale=scale, heads=num_heads, dim=dim,
            bounded=bounded, sq=sq, sk=sk,
        ),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec, qspec,
        ],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=interpret,
    )(lens, q, k, v, do)
    return dq, dk, dv, None


short_attention_packed.defvjp(
    lambda q, k, v, num_heads, kv_lens, scale, interpret, bounded: _packed_fwd(
        q, k, v, num_heads, kv_lens, scale, interpret, bounded
    ),
    _packed_bwd,
)


# ---------------------------------------------------------------- plumbing


def _pad_seq(x, target):
    pad = target - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))


def _run_fwd(q_bhsd, k_bhsd, v_bhsd, kv_lens, scale, interpret):
    batch, heads, sq, dim = q_bhsd.shape
    sk = k_bhsd.shape[2]
    spec = pl.BlockSpec((1, 1, sq, dim), lambda b, h: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, sk, dim), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, sq=sq, sk=sk),
        grid=(batch, heads),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, kspec, kspec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q_bhsd.shape, q_bhsd.dtype),
        interpret=interpret,
    )(kv_lens, q_bhsd, k_bhsd, v_bhsd)


def _run_bwd(q_bhsd, k_bhsd, v_bhsd, do_bhsd, kv_lens, scale, interpret):
    batch, heads, sq, dim = q_bhsd.shape
    sk = k_bhsd.shape[2]
    qspec = pl.BlockSpec((1, 1, sq, dim), lambda b, h: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, sk, dim), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, sq=sq, sk=sk),
        grid=(batch, heads),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec, qspec,
        ],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct(q_bhsd.shape, q_bhsd.dtype),
            jax.ShapeDtypeStruct(k_bhsd.shape, k_bhsd.dtype),
            jax.ShapeDtypeStruct(v_bhsd.shape, v_bhsd.dtype),
        ],
        interpret=interpret,
    )(kv_lens, q_bhsd, k_bhsd, v_bhsd, do_bhsd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def short_attention(q, k, v, kv_lens=None, scale=None, interpret=False):
    """(B, Sq, H, D) attention, whole-sequence per program.

    kv_lens: (B,) suffix key padding; scale defaults to D^-0.5.
    """
    out, _ = _short_fwd(q, k, v, kv_lens, scale, interpret)
    return out


def _prep(q, k, v, kv_lens):
    batch, sq, heads, dim = q.shape
    sk = k.shape[1]
    if kv_lens is None:
        kv_lens = jnp.full((batch,), sk, dtype=jnp.int32)
    sq_p = _ceil_to(sq, 8)
    sk_p = _ceil_to(sk, 8)
    qb = _pad_seq(q, sq_p).transpose(0, 2, 1, 3)  # BHSD
    kb = _pad_seq(k, sk_p).transpose(0, 2, 1, 3)
    vb = _pad_seq(v, sk_p).transpose(0, 2, 1, 3)
    return qb, kb, vb, kv_lens.astype(jnp.int32), sq, sk


def _short_fwd(q, k, v, kv_lens, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qb, kb, vb, lens, sq, sk = _prep(q, k, v, kv_lens)
    out = _run_fwd(qb, kb, vb, lens, scale, interpret)
    out = out.transpose(0, 2, 1, 3)[:, :sq]
    return out, (q, k, v, kv_lens)


def _short_bwd(scale, interpret, res, dout):
    q, k, v, kv_lens = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qb, kb, vb, lens, sq, sk = _prep(q, k, v, kv_lens)
    dob = _pad_seq(dout.astype(q.dtype), qb.shape[2]).transpose(0, 2, 1, 3)
    dq, dk, dv = _run_bwd(qb, kb, vb, dob, lens, scale, interpret)
    dq = dq.transpose(0, 2, 1, 3)[:, :sq]
    dk = dk.transpose(0, 2, 1, 3)[:, :sk]
    dv = dv.transpose(0, 2, 1, 3)[:, :sk]
    return dq, dk, dv, None


short_attention.defvjp(
    lambda q, k, v, kv_lens, scale, interpret: _short_fwd(
        q, k, v, kv_lens, scale, interpret
    ),
    _short_bwd,
)


# ------------------------------------------------- BHSD-native entry point


def _pad_seq_bhsd(x, target):
    pad = target - x.shape[2]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def short_attention_bhsd(q, k, v, kv_lens=None, scale=None, interpret=False):
    """(B, H, S, D) attention with no layout transposes: for callers that
    keep attention in BHSD so the pallas call isn't bracketed by relayout
    passes (the transposes are fusion barriers that cost more than the
    kernel saves at JiT scale — see ops/attention.py dispatch notes)."""
    out, _ = _short_bhsd_fwd(q, k, v, kv_lens, scale, interpret)
    return out


def _prep_bhsd(q, k, v, kv_lens):
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    if kv_lens is None:
        kv_lens = jnp.full((batch,), sk, dtype=jnp.int32)
    qb = _pad_seq_bhsd(q, _ceil_to(sq, 8))
    kb = _pad_seq_bhsd(k, _ceil_to(sk, 8))
    vb = _pad_seq_bhsd(v, _ceil_to(sk, 8))
    return qb, kb, vb, kv_lens.astype(jnp.int32), sq, sk


def _use_all_heads(qb, kb) -> bool:
    """All-heads-per-program needs q+k+v+o blocks resident at once; fall back
    to the (B, H) grid when that exceeds a conservative VMEM share."""
    per_block = (2 * qb[0].size + 2 * kb[0].size) * qb.dtype.itemsize
    return per_block <= 8 * 1024 * 1024


def _short_bhsd_fwd(q, k, v, kv_lens, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qb, kb, vb, lens, sq, sk = _prep_bhsd(q, k, v, kv_lens)
    run = _run_fwd_ah if _use_all_heads(qb, kb) else _run_fwd
    out = run(qb, kb, vb, lens, scale, interpret)
    return out[:, :, :sq], (q, k, v, kv_lens)


def _short_bhsd_bwd(scale, interpret, res, dout):
    q, k, v, kv_lens = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qb, kb, vb, lens, sq, sk = _prep_bhsd(q, k, v, kv_lens)
    dob = _pad_seq_bhsd(dout.astype(q.dtype), qb.shape[2])
    run = _run_bwd_ah if _use_all_heads(qb, kb) else _run_bwd
    dq, dk, dv = run(qb, kb, vb, dob, lens, scale, interpret)
    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk], None


short_attention_bhsd.defvjp(
    lambda q, k, v, kv_lens, scale, interpret: _short_bhsd_fwd(
        q, k, v, kv_lens, scale, interpret
    ),
    _short_bhsd_bwd,
)
