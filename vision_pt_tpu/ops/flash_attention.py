"""Pallas TPU flash attention (forward + backward), with key-padding support.

Replaces the reference's CUDA attention backends (flash-attn 2 / xformers /
torch sdpa, ``src/modules/attention.py:98-159``). Unlike the reference's flash
path — which cannot take a mask (``attention.py:135-137``) — this kernel
supports per-batch valid key lengths (suffix padding), which JiT's padded
context batches need.

Public layout is **(B, S, H, D)** (BSHD — what transformer blocks produce);
kernels run on BHSD with blocks ``(1, 1, block, head_dim)`` so the tiled dims
are the trailing two (a Mosaic requirement). The innermost grid axis iterates
kv blocks sequentially, letting Pallas double-buffer K/V HBM->VMEM copies
while the MXU computes; the online softmax accumulates in fp32 VMEM scratch.
The log-sum-exp residual is stored lane-broadcast as (B, H, S, 128), matching
the layout of jax's reference TPU kernel.

Backward is the standard two-kernel flash backward (dq; dk/dv) with the
delta = rowsum(dO * O) preprocess done in plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------- forward


def _fwd_kernel(
    kvlen_ref,  # SMEM (B, 1) int32 (whole array; indexed by program_id(0))
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bk, D)
    v_ref,  # (1, 1, bk, D)
    o_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, bq, LANES) f32
    acc_ref,  # VMEM (bq, D) f32
    m_ref,  # VMEM (bq, LANES) f32
    l_ref,  # VMEM (bq, LANES) f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale

    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    valid = col < kv_len
    if causal:
        row = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        valid = jnp.logical_and(valid, col <= row)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:, :1]  # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_kv - 1)
    def _finalize():
        l_final = l_ref[:, :1]
        safe_l = jnp.where(l_final == 0.0, 1.0, l_final)
        o_ref[0, 0, :, :] = (acc_ref[...] / safe_l).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(jnp.maximum(l_ref[:, :1], 1e-37))
        lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_forward(
    q: jax.Array,  # BHSD
    k: jax.Array,
    v: jax.Array,
    kv_lens: jax.Array,  # (B,) int32
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    num_q = sq // block_q
    num_kv = sk // block_k

    kvlen2d = kv_lens.reshape(batch, 1).astype(jnp.int32)

    qspec = pl.BlockSpec((1, 1, block_q, dim), lambda b, h, i, j: (b, h, i, 0))
    kspec = pl.BlockSpec((1, 1, block_k, dim), lambda b, h, i, j: (b, h, j, 0))

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            causal=causal,
        ),
        grid=(batch, heads, num_q, num_kv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec,
            kspec,
            kspec,
        ],
        out_specs=[
            qspec,
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, sq, dim), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dim), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(kvlen2d, q, k, v)
    return out, lse


# ---------------------------------------------------------------- backward


def _dq_kernel(
    kvlen_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,  # (1, 1, bq, LANES)
    delta_ref,  # (1, 1, bq, LANES)
    dq_ref,  # (1, 1, bq, D)
    dq_acc_ref,  # VMEM (bq, D) f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, :, :1]  # (bq, 1)
    delta = delta_ref[0, 0, :, :1]

    s = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    kv_len = kvlen_ref[pl.program_id(0), 0]
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    valid = col < kv_len
    if causal:
        row = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        valid = jnp.logical_and(valid, col <= row)

    p = jnp.where(valid, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale
    dq_acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype),
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kv - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = dq_acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(
    kvlen_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dk_ref,  # (1, 1, bk, D)
    dv_ref,
    dk_acc_ref,  # VMEM (bk, D) f32
    dv_acc_ref,
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
):
    jkv = pl.program_id(2)  # kv block (outer)
    iq = pl.program_id(3)  # q block (inner, sequential)
    num_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, :, :1].reshape(1, block_q)  # row per q position
    delta = delta_ref[0, 0, :, :1].reshape(1, block_q)

    # s_T[kv, q]
    s_t = (
        jax.lax.dot_general(
            k,
            q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    kv_len = kvlen_ref[pl.program_id(0), 0]
    krow = jkv * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, block_q), 0
    )
    valid = krow < kv_len
    if causal:
        qcol = iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1
        )
        valid = jnp.logical_and(valid, krow <= qcol)

    p_t = jnp.where(valid, jnp.exp(s_t - lse), 0.0)
    dv_acc_ref[...] += jax.lax.dot_general(
        p_t.astype(do.dtype),
        do,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v,
        do,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = p_t * (dp_t - delta) * scale
    dk_acc_ref[...] += jax.lax.dot_general(
        ds_t.astype(q.dtype),
        q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == num_q - 1)
    def _finalize():
        dk_ref[0, 0, :, :] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_acc_ref[...].astype(dv_ref.dtype)


def _flash_backward(
    q,  # BHSD
    k,
    v,
    kv_lens,
    out,
    lse,  # (B, H, Sq, LANES)
    do,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
):
    batch, heads, sq, dim = q.shape
    sk = k.shape[2]
    num_q = sq // block_q
    num_kv = sk // block_k

    # delta = rowsum(dO * O): elementwise; XLA fuses the broadcast to lanes.
    delta_row = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, Sq, 1)
    delta = jnp.broadcast_to(delta_row, (batch, heads, sq, LANES))

    kvlen2d = kv_lens.reshape(batch, 1).astype(jnp.int32)

    smemspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, 1, block_q, dim), lambda b, h, x, y: (b, h, x, 0))
    kspec = pl.BlockSpec((1, 1, block_k, dim), lambda b, h, x, y: (b, h, y, 0))
    rowspec = pl.BlockSpec(
        (1, 1, block_q, LANES), lambda b, h, x, y: (b, h, x, 0)
    )

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            causal=causal,
        ),
        grid=(batch, heads, num_q, num_kv),
        in_specs=[smemspec, qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dim), jnp.float32)],
        interpret=interpret,
    )(kvlen2d, q, k, v, do, lse, delta)

    # dk/dv: grid kv-outer, q-inner
    qspec2 = pl.BlockSpec((1, 1, block_q, dim), lambda b, h, y, x: (b, h, x, 0))
    kspec2 = pl.BlockSpec((1, 1, block_k, dim), lambda b, h, y, x: (b, h, y, 0))
    rowspec2 = pl.BlockSpec(
        (1, 1, block_q, LANES), lambda b, h, y, x: (b, h, x, 0)
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            causal=causal,
        ),
        grid=(batch, heads, num_kv, num_q),
        in_specs=[smemspec, qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2],
        out_specs=[kspec2, kspec2],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dim), jnp.float32),
            pltpu.VMEM((block_k, dim), jnp.float32),
        ],
        interpret=interpret,
    )(kvlen2d, q, k, v, do, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention_bhsd(
    q, k, v, kv_lens, scale, causal, block_q, block_k, interpret
):
    out, _ = _flash_forward(
        q, k, v, kv_lens, scale, causal, block_q, block_k, interpret
    )
    return out


def _flash_fwd_rule(q, k, v, kv_lens, scale, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(
        q, k, v, kv_lens, scale, causal, block_q, block_k, interpret
    )
    return out, (q, k, v, kv_lens, out, lse)


def _flash_bwd_rule(scale, causal, block_q, block_k, interpret, residuals, g):
    q, k, v, kv_lens, out, lse = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, kv_lens, out, lse, g, scale, causal, block_q, block_k, interpret
    )
    return dq, dk, dv, None


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Sk, H, D)
    v: jax.Array,  # (B, Sk, H, D)
    kv_lens: jax.Array | None = None,  # (B,) int32 valid key length (suffix padding)
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over BSHD tensors with optional suffix key padding.

    Sequences are padded internally to block multiples; padded keys are masked
    via kv_lens, padded query rows are sliced off the output.

    Default blocks are 1024x1024: per-program overhead dominates small
    blocks on v5e — measured at S=4096 fwd+bwd, (256,256) ran at 36.6 ms
    (slower than XLA's 32.6) while (1024,1024) runs at 15.2 ms, 2.15x
    faster than XLA. Blocks clamp to the (padded) sequence for shorter
    inputs.
    """
    batch, sq, heads, dim = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = dim**-0.5
    if kv_lens is None:
        kv_lens = jnp.full((batch,), sk, dtype=jnp.int32)

    def _fit_block(s: int, cap: int) -> int:
        # biggest block up to cap that doesn't waste >12.5% on padding
        b = min(cap, _ceil_to(s, 8))
        while b > 256 and (_ceil_to(s, b) - s) * 8 > s:
            b //= 2
        return b

    block_q = _fit_block(sq, block_q)
    block_k = _fit_block(sk, block_k)
    sq_pad = _ceil_to(sq, block_q)
    sk_pad = _ceil_to(sk, block_k)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), sk)

    out = _flash_attention_bhsd(
        qt, kt, vt, kv_lens, float(scale), causal, block_q, block_k, interpret
    )
    if sq_pad != sq:
        out = out[:, :, :sq]
    return jnp.transpose(out, (0, 2, 1, 3))
