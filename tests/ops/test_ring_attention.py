"""Ring attention vs the single-device XLA path on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_pt_tpu.ops.attention import dot_product_attention
from vision_pt_tpu.ops.ring_attention import ring_attention_sharded
from vision_pt_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def seq_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    return make_mesh({"data": -1, "seq": 4})


def _qkv(b=2, s=64, h=3, d=8, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, s, h, d)
    return tuple(jax.random.normal(k, shape, dtype=jnp.float32) for k in ks)


def test_forward_matches_xla(seq_mesh):
    q, k, v = _qkv()
    ref = dot_product_attention(q, k, v, backend="xla", attention_dtype=None)
    out = ring_attention_sharded(q, k, v, seq_mesh, "seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_kv_lens(seq_mesh):
    q, k, v = _qkv(b=3)
    kv_lens = jnp.asarray([64, 37, 9])  # crosses shard boundaries
    mask = jnp.arange(64)[None, :] < kv_lens[:, None]  # (B, Sk)
    ref = dot_product_attention(q, k, v, mask=mask, backend="xla",
                                attention_dtype=None)
    out = ring_attention_sharded(q, k, v, seq_mesh, "seq", kv_lens=kv_lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla(seq_mesh):
    q, k, v = _qkv(s=32)

    def loss_ring(q, k, v):
        return (ring_attention_sharded(q, k, v, seq_mesh, "seq") ** 2).sum()

    def loss_ref(q, k, v):
        return (
            dot_product_attention(q, k, v, backend="xla",
                                  attention_dtype=None) ** 2
        ).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=1e-4, rtol=1e-4)


def test_jit_and_odd_batch_dtype(seq_mesh):
    q, k, v = _qkv(b=1, s=128, h=2, d=16, seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, seq_mesh, "seq")
    )(q, k, v)
    ref = dot_product_attention(q, k, v, backend="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_indivisible_sequence_asserts(seq_mesh):
    q, k, v = _qkv(s=30)
    with pytest.raises(AssertionError):
        ring_attention_sharded(q, k, v, seq_mesh, "seq")
