import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_pt_tpu.ops.attention import dot_product_attention, xla_attention
from vision_pt_tpu.ops.flash_attention import flash_attention


def _ref_attention(q, k, v, kv_lens=None, scale=None, causal=False):
    """Straight numpy reference."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale or d**-0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k).astype(np.float64) * scale
    if kv_lens is not None:
        keymask = np.arange(sk)[None, :] < np.asarray(kv_lens)[:, None]
        logits = np.where(keymask[:, None, None, :], logits, -1e30)
    if causal:
        cm = np.tril(np.ones((sq, sk), dtype=bool))
        logits = np.where(cm[None, None], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, v).astype(np.float32)


@pytest.mark.parametrize("sq,sk", [(64, 64), (128, 256), (100, 77)])
def test_xla_attention_matches_reference(sq, sk):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, sq, 3, 32)).astype(np.float32)
    k = rng.normal(size=(2, sk, 3, 32)).astype(np.float32)
    v = rng.normal(size=(2, sk, 3, 32)).astype(np.float32)
    got = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, _ref_attention(q, k, v), atol=2e-5)


@pytest.mark.parametrize("sq,sk,d", [(128, 128, 64), (256, 128, 64), (96, 200, 64)])
def test_flash_forward_matches_reference(sq, sk, d):
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, sq, 2, d)).astype(np.float32)
    k = rng.normal(size=(2, sk, 2, d)).astype(np.float32)
    v = rng.normal(size=(2, sk, 2, d)).astype(np.float32)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=64, block_k=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, _ref_attention(q, k, v), atol=2e-4)


def test_flash_key_padding_mask():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 64, 2, 64)).astype(np.float32)
    k = rng.normal(size=(2, 128, 2, 64)).astype(np.float32)
    v = rng.normal(size=(2, 128, 2, 64)).astype(np.float32)
    kv_lens = np.array([128, 70], dtype=np.int32)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            kv_lens=jnp.asarray(kv_lens), block_q=64, block_k=64, interpret=True,
        )
    )
    np.testing.assert_allclose(
        got, _ref_attention(q, k, v, kv_lens=kv_lens), atol=2e-4
    )


def test_flash_causal():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(1, 128, 2, 64)).astype(np.float32)
    k, v = q.copy(), rng.normal(size=(1, 128, 2, 64)).astype(np.float32)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            causal=True, block_q=64, block_k=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, _ref_attention(q, k, v, causal=True), atol=2e-4)


def test_flash_gradients_match_xla():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 128, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 128, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 128, 2, 64)).astype(np.float32))
    kv_lens = jnp.asarray([100], dtype=jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_lens=kv_lens, block_q=64, block_k=64,
                            interpret=True)
        return jnp.sum(jnp.square(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, kv_lens=kv_lens)
        return jnp.sum(jnp.square(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2,
        )


def test_dispatch_casts_fp32_to_bf16():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(1, 16, 1, 32)).astype(np.float32))
    out = dot_product_attention(q, q, q, backend="xla")
    assert out.dtype == jnp.float32  # cast back to original

    out_bf = dot_product_attention(
        q.astype(jnp.bfloat16), q.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        backend="xla",
    )
    assert out_bf.dtype == jnp.bfloat16


def test_dispatch_bool_mask_xla():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(2, 8, 2, 16)).astype(np.float32))
    mask = jnp.asarray(np.arange(8)[None, :] < np.array([[8], [5]]))  # (B, Sk)
    out = dot_product_attention(q, q, q, mask=mask, backend="xla",
                                attention_dtype=None)
    want = _ref_attention(
        np.asarray(q), np.asarray(q), np.asarray(q), kv_lens=np.array([8, 5])
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


def test_short_attention_matches_xla():
    """Whole-sequence-in-VMEM kernel (interpret mode on CPU) vs XLA."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_pt_tpu.ops.attention import dot_product_attention
    from vision_pt_tpu.ops.short_attention import short_attention

    B, S, H, D = 2, 37, 4, 16
    key = jax.random.key(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D))
        for i in range(3)
    )
    kv_lens = jnp.asarray([37, 20], dtype=jnp.int32)
    ref = dot_product_attention(
        q, k, v, kv_lens=kv_lens, backend="xla", attention_dtype=None
    )
    out = short_attention(q, k, v, kv_lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_new(q, k, v):
        return (short_attention(q, k, v, kv_lens, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(
            q, k, v, kv_lens=kv_lens, backend="xla", attention_dtype=None
        ) ** 2).sum()

    gn = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gn, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_short_attention_bhsd_matches_bshd():
    from vision_pt_tpu.ops.short_attention import (
        short_attention,
        short_attention_bhsd,
    )

    q = jax.random.normal(jax.random.key(0), (2, 37, 4, 64), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (2, 37, 4, 64), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (2, 37, 4, 64), dtype=jnp.float32)
    kv_lens = jnp.asarray([37, 21], dtype=jnp.int32)

    ref = short_attention(q, k, v, kv_lens, interpret=True)
    out = short_attention_bhsd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), kv_lens, interpret=True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # grads agree too
    g_ref = jax.grad(
        lambda q: (short_attention(q, k, v, kv_lens, interpret=True) ** 2).sum()
    )(q)
    g_out = jax.grad(
        lambda q: (
            short_attention_bhsd(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), kv_lens, interpret=True,
            ) ** 2
        ).sum()
    )(q)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=1e-4)


def test_short_attention_packed_matches_bshd():
    """(B, S, H*D) zero-relayout entry (the JiT denoiser's TPU hot path)."""
    from vision_pt_tpu.ops.short_attention import (
        short_attention,
        short_attention_packed,
    )

    B, S, H, D = 2, 37, 4, 64
    q = jax.random.normal(jax.random.key(0), (B, S, H, D), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, S, H, D), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, S, H, D), dtype=jnp.float32)
    kv_lens = jnp.asarray([37, 21], dtype=jnp.int32)

    ref = short_attention(q, k, v, kv_lens, interpret=True)
    out = short_attention_packed(
        q.reshape(B, S, H * D), k.reshape(B, S, H * D),
        v.reshape(B, S, H * D), H, kv_lens, interpret=True,
    ).reshape(B, S, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_ref = jax.grad(
        lambda q, k, v: (
            short_attention(q, k, v, kv_lens, interpret=True) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_out = jax.grad(
        lambda q, k, v: (
            short_attention_packed(
                q.reshape(B, S, H * D), k.reshape(B, S, H * D),
                v.reshape(B, S, H * D), H, kv_lens, interpret=True,
            ) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_short_attention_packed_unpairable_heads_fallback():
    """Odd head counts (and 2*dim > 128) can't take the head-PAIRED MXU
    schedule — the packed kernel must fall back to the per-head loop with
    identical semantics. H=3 exercises the fallback; H=2/D=32 exercises a
    pair at sub-64 dim."""
    from vision_pt_tpu.ops.short_attention import (
        _pairable,
        short_attention,
        short_attention_packed,
    )

    assert not _pairable(3, 64) and _pairable(2, 32) and not _pairable(4, 128)
    for H, D in [(3, 64), (2, 32)]:
        B, S = 2, 21
        q = jax.random.normal(jax.random.key(0), (B, S, H, D),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (B, S, H, D),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (B, S, H, D),
                              dtype=jnp.float32)
        kv_lens = jnp.asarray([21, 13], dtype=jnp.int32)
        ref = short_attention(q, k, v, kv_lens, interpret=True)
        for bounded in (False, True):
            out = short_attention_packed(
                q.reshape(B, S, H * D), k.reshape(B, S, H * D),
                v.reshape(B, S, H * D), H, kv_lens, None, True, bounded,
            ).reshape(B, S, H, D)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
            )
        g_ref = jax.grad(
            lambda q, k, v: (
                short_attention(q, k, v, kv_lens, interpret=True) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_out = jax.grad(
            lambda q, k, v: (
                short_attention_packed(
                    q.reshape(B, S, H * D), k.reshape(B, S, H * D),
                    v.reshape(B, S, H * D), H, kv_lens, None, True, True,
                ) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_out, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_short_attention_packed_bounded_matches_stable():
    """bounded=True (no-max softmax, QKNorm-bounded logits fast path) is
    exactly softmax inside BOUNDED_LOGIT_CLIP — forward AND grads match the
    stable path."""
    from vision_pt_tpu.ops.short_attention import short_attention_packed

    B, S, H, D = 2, 37, 4, 64
    E = H * D
    q = jax.random.normal(jax.random.key(0), (B, S, E), dtype=jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, S, E), dtype=jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, S, E), dtype=jnp.float32)
    kv_lens = jnp.asarray([37, 21], dtype=jnp.int32)

    ref = short_attention_packed(q, k, v, H, kv_lens, None, True, False)
    out = short_attention_packed(q, k, v, H, kv_lens, None, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(q, k, v, bounded):
        return (
            short_attention_packed(q, k, v, H, kv_lens, None, True, bounded)
            ** 2
        ).sum()

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, False)
    g_out = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, True)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
