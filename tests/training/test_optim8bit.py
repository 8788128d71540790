"""8-bit optimizer states (bnb AdamW8bit equivalent,
reference ``src/optimizer/util.py:6-32`` dotted-name path)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vision_pt_tpu.training.optim8bit import (
    _dequantize_static,
    _quantize,
    adamw8bit,
)
from vision_pt_tpu.training.optimizer import get_optimizer


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32) * 3.0)
    q, s = _quantize(x)
    assert q.dtype == jnp.int8
    back = _dequantize_static(q, s, x.shape)
    # blockwise linear int8: error bounded by absmax/254 per block
    err = np.abs(np.asarray(back - x))
    assert err.max() <= float(jnp.abs(x).max()) / 254 + 1e-7


def test_adamw8bit_state_is_int8():
    params = {"w": jnp.zeros((300, 7)), "b": jnp.zeros((7,))}
    tx = adamw8bit(1e-3)
    state = tx.init(params)
    inner = state[0] if isinstance(state, tuple) else state
    leaves_q = jax.tree.leaves(inner.m_q) + jax.tree.leaves(inner.v_q)
    assert all(leaf.dtype == jnp.int8 for leaf in leaves_q)


def test_adamw8bit_converges_like_fp32_adamw():
    """Quadratic bowl: the 8-bit variant must track fp32 AdamW closely."""

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"] - 3.0)) + jnp.sum(
            jnp.square(p["b"] + 1.0)
        )

    def run(tx, steps=200):
        params = {"w": jnp.zeros((64, 8)), "b": jnp.zeros((8,))}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            grads = jax.grad(loss_fn)(params)
            updates, state = tx.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(steps):
            params, state = step(params, state)
        return float(loss_fn(params))

    l8 = run(adamw8bit(0.05, weight_decay=0.0))
    l32 = run(optax.adamw(0.05, weight_decay=0.0))
    assert l8 < 1.0, f"8-bit adamw failed to converge: {l8}"
    assert l8 < max(10 * l32, 1.0)


def test_factory_resolves_bnb_names_to_8bit():
    tx = get_optimizer("bitsandbytes.optim.AdamW8bit", {"lr": 1e-3})
    params = {"w": jnp.zeros((300,))}
    state = tx.init(params)
    flat = jax.tree.leaves(state)
    assert any(leaf.dtype == jnp.int8 for leaf in flat if hasattr(leaf, "dtype"))
