"""8-bit optimizer states (TPU-native analog of bitsandbytes AdamW8bit,
reference dotted-name ``bitsandbytes.optim.AdamW8bit`` via
``src/optimizer/util.py:6-32``).

bnb stores Adam moments as int8 with blockwise absmax scales and dequantizes
inside a CUDA kernel. The TPU version keeps the same idea as pure XLA: m and
v live as int8 (+ fp32 per-block absmax), each update dequantizes, applies
the standard AdamW math, and requantizes — all fused by XLA into the update
program. State HBM for the moments drops 4x vs fp32 (int8 + 1/BLOCK fp32
scales). Not bit-compatible with bnb's dynamic-tree quantization map (no
checkpoint interchange is needed — train state stays in orbax); linear
blockwise quantization is used, with the second moment quantized in sqrt
space for dynamic range (bnb does the same for v).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    flat = x.reshape(-1)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_static(q, scale, shape):
    size = 1
    for s in shape:
        size *= int(s)
    x = q.astype(jnp.float32) * scale[:, None]
    return x.reshape(-1)[:size].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    m_q: optax.Params
    m_scale: optax.Params
    v_q: optax.Params  # sqrt-space payload
    v_scale: optax.Params


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam moment tracking with int8 blockwise-quantized m and v."""

    def init(params):
        def zeros_like_q(p):
            return _quantize(jnp.zeros(p.shape, jnp.float32))

        m = jax.tree.map(zeros_like_q, params)
        v = jax.tree.map(zeros_like_q, params)
        is_pair = lambda x: isinstance(x, tuple)  # noqa: E731
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            m_q=jax.tree.map(lambda t: t[0], m, is_leaf=is_pair),
            m_scale=jax.tree.map(lambda t: t[1], m, is_leaf=is_pair),
            v_q=jax.tree.map(lambda t: t[0], v, is_leaf=is_pair),
            v_scale=jax.tree.map(lambda t: t[1], v, is_leaf=is_pair),
        )

    def update(updates, state, params=None):
        count = optax.safe_int32_increment(state.count)

        def per_leaf(g, mq, ms, vq, vs):
            g = g.astype(jnp.float32)
            m = _dequantize_static(mq, ms, g.shape)
            # v stored in sqrt space: v = (payload)^2 preserves small values
            v_sqrt = _dequantize_static(vq, vs, g.shape)
            v = jnp.square(v_sqrt)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * jnp.square(g)
            m_hat = m / (1 - b1 ** count.astype(jnp.float32))
            v_hat = v / (1 - b2 ** count.astype(jnp.float32))
            step = m_hat / (jnp.sqrt(v_hat) + eps)
            new_mq, new_ms = _quantize(m)
            new_vq, new_vs = _quantize(jnp.sqrt(v))
            return step.astype(g.dtype), new_mq, new_ms, new_vq, new_vs

        flat_g, treedef = jax.tree.flatten(updates)
        flat_mq = treedef.flatten_up_to(state.m_q)
        flat_ms = treedef.flatten_up_to(state.m_scale)
        flat_vq = treedef.flatten_up_to(state.v_q)
        flat_vs = treedef.flatten_up_to(state.v_scale)

        outs = [
            per_leaf(g, mq, ms, vq, vs)
            for g, mq, ms, vq, vs in zip(
                flat_g, flat_mq, flat_ms, flat_vq, flat_vs
            )
        ]
        steps = treedef.unflatten([o[0] for o in outs])
        new_state = ScaleByAdam8bitState(
            count=count,
            m_q=treedef.unflatten([o[1] for o in outs]),
            m_scale=treedef.unflatten([o[2] for o in outs]),
            v_q=treedef.unflatten([o[3] for o in outs]),
            v_scale=treedef.unflatten([o[4] for o in outs]),
        )
        return steps, new_state

    return optax.GradientTransformation(init, update)


def adamw8bit(
    learning_rate: float | optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """bnb AdamW8bit equivalent: int8 moments + decoupled weight decay."""
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def adam8bit(
    learning_rate: float | optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )
