import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vision_pt_tpu.ops.norm import (
    DerfNorm,
    DyTNorm,
    FP32LayerNorm,
    FP32RMSNorm,
    SingleAdaLayerNormZero,
    fp32_layer_norm,
    fp32_rms_norm,
    get_norm_layer,
)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    got = fp32_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-6) * w + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    got = fp32_rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fp32_compute_with_bf16_inputs():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 32)), dtype=jnp.bfloat16)
    y = fp32_layer_norm(x)
    assert y.dtype == jnp.bfloat16
    y32 = fp32_layer_norm(x.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(y, dtype=np.float32), np.asarray(y32), atol=0.05
    )


def test_ada_layer_norm_zero_starts_as_identity_norm():
    rngs = nnx.Rngs(0)
    mod = SingleAdaLayerNormZero(hidden_dim=16, gate_dim=16, embedding_dim=8, rngs=rngs)
    x = jax.random.normal(jax.random.key(0), (2, 5, 16))
    t = jax.random.normal(jax.random.key(1), (2, 8))
    out = mod(x, t)
    # zero-init projections: scale=shift=gate=0 -> output is plain layernorm
    np.testing.assert_allclose(
        np.asarray(out.hidden_states), np.asarray(fp32_layer_norm(x)), atol=1e-6
    )
    assert np.all(np.asarray(out.gate) == 0)


def test_dyt_and_derf_shapes():
    for mod in (DyTNorm(16), DerfNorm(16)):
        x = jax.random.normal(jax.random.key(0), (2, 3, 16))
        y = mod(x)
        assert y.shape == x.shape
    # alpha=0.5, weight=1, bias=0 -> tanh(0.5x)
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(
        np.asarray(DyTNorm(4)(x)), np.tanh(0.5 * np.ones((1, 4))), atol=1e-5
    )


def test_get_norm_layer_factory():
    for t, cls in [
        ("layer", FP32LayerNorm),
        ("rms", FP32RMSNorm),
        ("dyt", DyTNorm),
        ("derf", DerfNorm),
    ]:
        assert isinstance(get_norm_layer(t, 8), cls)
