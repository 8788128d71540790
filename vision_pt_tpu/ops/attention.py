"""Attention dispatch: one entry point over the XLA and Pallas-flash backends.

TPU-native rebuild of the reference's ``src/modules/attention.py:98-159``
(``eager``/``sdpa``/``flash_attention_2``/``xformers`` collapse to two TPU
backends: a fused Pallas flash kernel and an XLA fallback). Matches the
reference's semantics: fp32 inputs are auto-cast to the attention dtype
(default bf16), default non-causal, optional key-padding mask.

Layout: **(B, S, H, D)** throughout — no BHSD<->BSHD permutes on the hot path.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Literal

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention
from .short_attention import MAX_SHORT_SEQ, short_attention

AttentionImplementation = Literal[
    "auto", "flash", "short", "xla", "eager", "sdpa", "ring"
]

# fp32 q/k/v are cast to this dtype before attention (reference
# ``attention.py:113-118`` casts to bf16). Overridable for parity testing via
# set_default_attention_dtype(None) to keep fp32 end-to-end.
_DEFAULT_ATTENTION_DTYPE: jnp.dtype | None = jnp.bfloat16
_SENTINEL = object()


def set_default_attention_dtype(dtype: jnp.dtype | None) -> None:
    global _DEFAULT_ATTENTION_DTYPE
    _DEFAULT_ATTENTION_DTYPE = dtype


def get_default_attention_dtype() -> jnp.dtype | None:
    return _DEFAULT_ATTENTION_DTYPE


@contextlib.contextmanager
def attention_dtype(dtype: jnp.dtype | None):
    """Scoped override of the default attention compute dtype, restoring the
    value that was set before entry (parity tests run fp32 inside this)."""
    prev = get_default_attention_dtype()
    set_default_attention_dtype(dtype)
    try:
        yield
    finally:
        set_default_attention_dtype(prev)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------- seq parallel
# Sequence-parallel (ring attention) dispatch: a trace-time context holding
# (mesh, seq axis, batch axes). While active, eligible self-attention calls
# route through ops/ring_attention.py — the sequence axis is sharded over the
# mesh's seq axis and K/V shards rotate via ppermute over ICI. This is how
# the seq axis of parallel/mesh.MeshConfig becomes load-bearing inside a
# model forward (the reference has no equivalent; SURVEY §5 long-context).
_SEQ_PARALLEL: tuple["jax.sharding.Mesh", str, tuple[str, ...]] | None = None
# trace-time dispatch counter so tests/dryruns can assert the ring path was
# actually taken (a silent fallback would still produce correct numbers)
_RING_DISPATCH_COUNT = 0


@contextlib.contextmanager
def sequence_parallel(
    mesh: "jax.sharding.Mesh",
    axis_name: str = "seq",
    batch_axes: tuple[str, ...] = ("data", "fsdp"),
):
    """Scoped activation of ring-attention dispatch. Trace code inside this
    block (the context is consulted at TRACE time, so wrap the jitted call,
    not the jit construction). No-op when the mesh's seq axis is size 1.

    ``batch_axes`` names the mesh axes the batch dim is already sharded over
    (the trainer's ``shard_batch`` layout) so the ring keeps that sharding
    instead of gathering the batch."""
    global _SEQ_PARALLEL
    prev = _SEQ_PARALLEL
    if dict(mesh.shape).get(axis_name, 1) > 1:
        batch_axes = tuple(a for a in batch_axes if a in mesh.shape)
        _SEQ_PARALLEL = (mesh, axis_name, batch_axes)
    try:
        yield
    finally:
        _SEQ_PARALLEL = prev


def get_sequence_parallel():
    """The active (mesh, axis_name, batch_axes) triple, or None."""
    return _SEQ_PARALLEL


def ring_dispatch_count() -> int:
    """How many attention calls traced through the ring path so far (process-
    global; take a before/after delta)."""
    return _RING_DISPATCH_COUNT


def _ring_eligible(q, k, mask, is_causal, n: int) -> bool:
    return (
        mask is None
        and not is_causal
        and q.shape[1] == k.shape[1]
        and q.shape[1] % n == 0
    )


def xla_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,  # bool (B, 1|H, Sq, Sk) or (B, Sk); True = keep
    kv_lens: jax.Array | None = None,  # (B,) valid key length
    scale: float | None = None,
    is_causal: bool = False,
) -> jax.Array:
    """Plain XLA softmax attention (the sdpa-equivalent fallback path).

    XLA fuses this into an efficient (if O(S^2) memory) computation; used for
    CPU tests and as the non-Pallas backend.
    """
    batch, sq, heads, dim = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=logits.dtype)
    if kv_lens is not None:
        key_valid = (
            jnp.arange(sk, dtype=jnp.int32)[None, :] < kv_lens[:, None]
        )  # (B, Sk)
        logits = jnp.where(key_valid[:, None, None, :], logits, neg)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            if mask.ndim == 2:  # (B, Sk) key-padding
                mask = mask[:, None, None, :]
            logits = jnp.where(mask, logits, neg)
        else:  # additive bias
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            logits = logits + mask.astype(logits.dtype)
    if is_causal:
        causal = jnp.tril(jnp.ones((sq, sk), dtype=jnp.bool_))
        logits = jnp.where(causal[None, None], logits, neg)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out


def _masked_logits(q, k, mask, kv_lens, scale, is_causal):
    sq, sk = q.shape[1], k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=logits.dtype)
    if kv_lens is not None:
        key_valid = (
            jnp.arange(sk, dtype=jnp.int32)[None, :] < kv_lens[:, None]
        )
        logits = jnp.where(key_valid[:, None, None, :], logits, neg)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            logits = jnp.where(mask, logits, neg)
        else:
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            logits = logits + mask.astype(logits.dtype)
    if is_causal:
        causal = jnp.tril(jnp.ones((sq, sk), dtype=jnp.bool_))
        logits = jnp.where(causal[None, None], logits, neg)
    return logits


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def xla_attention_remat(q, k, v, mask, kv_lens, scale, is_causal):
    """XLA attention that does NOT keep the S x S tensor between forward and
    backward. The plain version stores fp32 softmax weights as a residual —
    at (B=64, H=12, S=298) that is 273 MB per layer and the attention
    backward becomes pure HBM traffic (profiled: ~2.5 ms per bwd dot, >50%
    of the JiT-B train step). Here only (out, lse) are saved and the
    backward recomputes probabilities flash-style, in bf16."""
    out, _ = _attn_remat_fwd_core(q, k, v, mask, kv_lens, scale, is_causal)
    return out


def _attn_remat_fwd_core(q, k, v, mask, kv_lens, scale, is_causal):
    logits = _masked_logits(q, k, mask, kv_lens, scale, is_causal)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B, H, Sq) f32
    weights = jnp.exp(logits - lse[..., None])
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out, lse


def _attn_remat_fwd(q, k, v, mask, kv_lens, scale, is_causal):
    out, lse = _attn_remat_fwd_core(q, k, v, mask, kv_lens, scale, is_causal)
    return out, (q, k, v, mask, kv_lens, out, lse)


def _attn_remat_bwd(scale, is_causal, res, dout):
    q, k, v, mask, kv_lens, out, lse = res
    logits = _masked_logits(q, k, mask, kv_lens, scale, is_causal)
    p = jnp.exp(logits - lse[..., None])  # (B, H, Sq, Sk) f32, transient
    p_lowp = p.astype(v.dtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p_lowp, dout.astype(v.dtype))
    dp = jnp.einsum(
        "bqhd,bkhd->bhqk", dout, v, preferred_element_type=jnp.float32
    )
    delta = jnp.einsum(
        "bqhd,bqhd->bhq", dout.astype(jnp.float32), out.astype(jnp.float32)
    )
    ds = p * (dp - delta[..., None])  # f32
    ds_lowp = ds.astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds_lowp, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds_lowp, q) * scale
    dmask = None
    if mask is not None and mask.dtype != jnp.bool_:
        dmask = ds.astype(mask.dtype)
        if mask.ndim == 2:
            dmask = dmask.sum(axis=(1, 2))
        else:
            dmask = dmask.sum(
                axis=tuple(
                    i for i in range(ds.ndim) if mask.shape[i] == 1
                ),
                keepdims=True,
            ).reshape(mask.shape)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dmask,
        None,
    )


xla_attention_remat.defvjp(_attn_remat_fwd, _attn_remat_bwd)


def dot_product_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    scale: float | None = None,
    backend: AttentionImplementation = "auto",
    attention_dtype: jnp.dtype | None = _SENTINEL,  # type: ignore[assignment]
    is_causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Unified attention entry point (reference ``attention.py:98-159``).

    fp32 q/k/v are cast to ``attention_dtype`` (reference ``:113-118``); output
    comes back in the (possibly cast) compute dtype. ``mask`` follows the XLA
    path only; the flash path takes ``kv_lens`` (suffix key padding) — a
    capability the reference's flash backend lacks outright.
    """
    assert q.ndim == k.ndim == v.ndim == 4
    if attention_dtype is _SENTINEL:
        attention_dtype = _DEFAULT_ATTENTION_DTYPE
    orig_dtype = q.dtype
    if q.dtype == jnp.float32 and attention_dtype is not None:
        q = q.astype(attention_dtype)
        k = k.astype(attention_dtype)
        v = v.astype(attention_dtype)

    if backend in ("eager", "sdpa"):
        backend = "xla"

    sp = _SEQ_PARALLEL
    if backend in ("auto", "ring") and sp is not None:
        mesh, axis, batch_axes = sp
        n = mesh.shape[axis]
        eligible = _ring_eligible(q, k, mask, is_causal, n)
        if backend == "ring" and not eligible:
            raise ValueError(
                "backend='ring' needs self-attention (Sq == Sk, divisible by "
                f"the seq axis ({n})), no mask, non-causal; got "
                f"Sq={q.shape[1]} Sk={k.shape[1]} mask={mask is not None} "
                f"causal={is_causal}"
            )
        if eligible:
            from .ring_attention import ring_attention_sharded

            global _RING_DISPATCH_COUNT
            _RING_DISPATCH_COUNT += 1
            out = ring_attention_sharded(
                q, k, v, mesh, axis, kv_lens=kv_lens, scale=scale,
                batch_axes=batch_axes,
            )
            return out.astype(orig_dtype) if orig_dtype != out.dtype else out
    elif backend == "ring":
        raise ValueError(
            "backend='ring' requires an active sequence_parallel(...) "
            "context (see ops.attention.sequence_parallel)"
        )

    if backend == "auto":
        on_tpu = _on_tpu() or interpret
        # flash wins on long sequences (2.36x over XLA fwd+bwd at S=4096
        # with 1024x1024 blocks); below ~1k, XLA. The "short"
        # whole-(S,S)-in-VMEM kernel beats both in ISOLATION at S=298
        # (3.87 ms/layer vs flash 5.00 vs XLA 7.52, B=64 fwd+bwd) but
        # LOSES inside the full train step (378 vs 433 img/s on the JiT-B
        # headline, re-measured this round): the BSHD<->BHSD transposes
        # around the pallas call are fusion barriers that cost more than
        # the kernel saves. auto therefore stays on XLA below the flash
        # threshold; pass backend="short" explicitly for workloads whose
        # fusion context differs. The JiT denoiser instead calls
        # short_attention_packed directly — heads as (B, S, H*D) lane
        # slices, a FREE reshape on both sides — which finally banks the
        # isolation win end-to-end (432.4 -> 471.6 img/s, +9.1%).
        flash_ok = (
            mask is None
            and q.shape[-1] % 64 == 0
            and q.shape[1] >= 1024
            and k.shape[1] >= 1024
            and on_tpu
        )
        backend = "flash" if flash_ok else "xla"

    if backend == "flash":
        if mask is not None:
            raise ValueError(
                "flash backend takes kv_lens (suffix padding), not a full mask"
            )
        out = flash_attention(
            q,
            k,
            v,
            kv_lens=kv_lens,
            scale=scale,
            causal=is_causal,
            interpret=interpret or not _on_tpu(),
        )
    elif backend == "short":
        if mask is not None or is_causal:
            raise ValueError(
                "short backend takes kv_lens only (no mask/causal)"
            )
        out = short_attention(q, k, v, kv_lens, scale,
                              interpret or not _on_tpu())
    elif backend == "xla":
        if scale is None:
            scale = q.shape[-1] ** -0.5
        out = xla_attention_remat(q, k, v, mask, kv_lens, scale, is_causal)
    else:
        raise ValueError(f"Unknown backend: {backend}")
    return out.astype(orig_dtype) if orig_dtype != out.dtype else out


def get_attn_implementation_label(use_flash_attention: bool) -> str:
    """Reference ``attention.py:162-170`` parity shim (for HF model kwargs)."""
    return "flash_attention_2" if use_flash_attention else "sdpa"
