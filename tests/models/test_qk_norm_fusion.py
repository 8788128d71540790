"""The fused RMSNorm+RoPE q/k path (``_rms_rope``) must match the plain
norm-then-rotate computation: ``rope((x/rms)·g) == rope(x·g)·(1/rms)`` is an
exact identity in real arithmetic (RMS division is a per-row scalar, RoPE is
linear), so the fp32 paths agree to rounding. Reference semantics:
``src/models/jit/denoiser.py:290-397`` (q/k RMS norm then RoPE)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vision_pt_tpu.models.jit.denoiser import (
    Attention,
    RopeEmbedder,
    apply_rope,
    _rms_rope,
)
from vision_pt_tpu.ops.norm import FP32RMSNorm, get_norm_layer


def _freqs(s, head_dim=64):
    embedder = RopeEmbedder(axes_dims=(head_dim // 2, head_dim // 4,
                                       head_dim // 4))
    return jnp.asarray(embedder(embedder.prepare_context_position_ids(s)))


def test_rms_rope_matches_norm_then_rotate_fp32():
    b, s, h, d = 2, 24, 3, 64
    x = jax.random.normal(jax.random.key(0), (b, s, h, d), dtype=jnp.float32)
    norm = FP32RMSNorm(d, eps=1e-6)
    # non-trivial gains
    norm.weight.value = jax.random.uniform(
        jax.random.key(1), (d,), minval=0.5, maxval=1.5
    )
    freqs = _freqs(s, d)
    ref = apply_rope(norm(x), freqs)
    out = _rms_rope(x, norm, freqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_rms_rope_matches_in_bf16():
    b, s, h, d = 2, 16, 2, 64
    x = jax.random.normal(
        jax.random.key(2), (b, s, h, d), dtype=jnp.float32
    ).astype(jnp.bfloat16)
    norm = FP32RMSNorm(d, eps=1e-6)
    freqs = _freqs(s, d)
    ref = apply_rope(norm(x), freqs)
    out = _rms_rope(x, norm, freqs)
    # bf16 squares vs fp32 squares in the stats: ~1e-3-level agreement
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_attention_fused_vs_generic_projection():
    """Attention._project_qkv (fused dispatch for RMS) vs a hand-built
    generic computation through the same module weights."""
    dim, heads, s, b = 128, 2, 24, 2
    attn = Attention(dim=dim, num_heads=heads, qk_norm=True,
                     norm_type="rms", rngs=nnx.Rngs(0))
    attn.q_norm.weight.value = jax.random.uniform(
        jax.random.key(3), (dim // heads,), minval=0.5, maxval=1.5
    )
    x = jax.random.normal(jax.random.key(4), (b, s, dim), dtype=jnp.float32)
    freqs = _freqs(s, dim // heads)
    q, k, v = attn._project_qkv(x, freqs)

    q_ref = attn._split_heads(attn.to_q(x))
    k_ref = attn._split_heads(attn.to_k(x))
    q_ref = apply_rope(attn.q_norm(q_ref), freqs)
    k_ref = apply_rope(attn.k_norm(k_ref), freqs)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_dispatch_is_gated_on_compute_dtype(monkeypatch):
    """fp32 activations must take the PLAIN norm-then-rotate path and bf16
    the fused one: the fusion's win is eliminating the fp32 upcast pass,
    and with fp32 inputs it instead breaks the elementwise fusion chain
    (measured −19% on the JiT-S 64² fp32 chained train step, 2026-08-20 —
    the whole r3→r4 jit_s bench regression)."""
    import vision_pt_tpu.models.jit.denoiser as dn

    calls = []
    real = dn._rms_rope

    def counting(x, norm, freqs):
        calls.append(x.dtype)
        return real(x, norm, freqs)

    monkeypatch.setattr(dn, "_rms_rope", counting)

    dim, heads, s, b = 128, 2, 16, 2
    freqs = _freqs(s, dim // heads)

    attn32 = Attention(dim=dim, num_heads=heads, qk_norm=True,
                       norm_type="rms", rngs=nnx.Rngs(0))
    x32 = jax.random.normal(jax.random.key(6), (b, s, dim), dtype=jnp.float32)
    attn32._project_qkv(x32, freqs)
    assert calls == [], "fp32 activations must not dispatch the fused path"

    attn16 = Attention(dim=dim, num_heads=heads, qk_norm=True,
                       norm_type="rms", dtype=jnp.bfloat16,
                       rngs=nnx.Rngs(0))
    x16 = x32.astype(jnp.bfloat16)
    attn16._project_qkv(x16, freqs)
    assert calls and all(d == jnp.bfloat16 for d in calls), (
        "bf16 activations must dispatch the fused path"
    )


def test_layer_norm_qk_takes_generic_path():
    """LayerNorm q/k norms don't commute with the rotation; the module must
    fall back to norm-then-rotate and still be correct."""
    dim, heads, s, b = 128, 2, 16, 2
    attn = Attention(dim=dim, num_heads=heads, qk_norm=True,
                     norm_type="layer", rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(5), (b, s, dim), dtype=jnp.float32)
    freqs = _freqs(s, dim // heads)
    q, k, v = attn._project_qkv(x, freqs)
    q_ref = apply_rope(attn.q_norm(attn._split_heads(attn.to_q(x))), freqs)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               atol=1e-6, rtol=1e-6)
