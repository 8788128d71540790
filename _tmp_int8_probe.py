"""Probe: does an int8xint8->int32 dot beat bf16 on the v5e MXU at JiT-B
MLP shapes? Decides whether an AQT-style int8 training path is worth
building. Timing per the verify skill: scalar fetch, varied inputs,
chained reps."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, N = 64 * 298, 768, 3072  # JiT-B batch-64 MLP up-projection
REPS = 16


def time_steps(fn, steps=3, windows=3):
    best = float("inf")
    c = 0
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn(c)
            c += 1
        float(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


xs_bf16 = [
    jax.random.normal(jax.random.key(i), (M, K), dtype=jnp.bfloat16)
    for i in range(4)
]
w_bf16 = jax.random.normal(jax.random.key(99), (K, N), dtype=jnp.bfloat16)
xs_i8 = [
    (x * 10).astype(jnp.int8) for x in xs_bf16
]
w_i8 = (w_bf16 * 10).astype(jnp.int8)


@jax.jit
def chain_bf16(x):
    def body(x, _):
        y = x @ w_bf16
        return x + y[:, :K] * jnp.bfloat16(1e-6), y.sum()

    x, ys = jax.lax.scan(body, x, None, length=REPS)
    return ys.sum()


@jax.jit
def chain_i8(x):
    def body(x, _):
        y = jax.lax.dot_general(
            x, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # data dependency to defeat CSE, staying int8
        return x ^ y[:, :K].astype(jnp.int8), y.sum()

    x, ys = jax.lax.scan(body, x, None, length=REPS)
    return ys.sum()


# int8 with dynamic quantization of activations (the real AQT fwd cost)
@jax.jit
def chain_i8_dynq(x):
    def body(x, _):
        sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
        xq = jnp.round(x / sx).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        yf = y.astype(jnp.float32) * sx
        return x + yf[:, :K].astype(x.dtype) * jnp.bfloat16(1e-6), yf.sum()

    x, ys = jax.lax.scan(body, x, None, length=REPS)
    return ys.sum()


float(chain_bf16(xs_bf16[0]))
float(chain_i8(xs_i8[0]))
float(chain_i8_dynq(xs_bf16[0]))

t_bf16 = time_steps(lambda i: chain_bf16(xs_bf16[i % 4])) / REPS
t_i8 = time_steps(lambda i: chain_i8(xs_i8[i % 4])) / REPS
t_dynq = time_steps(lambda i: chain_i8_dynq(xs_bf16[i % 4])) / REPS
flops = 2 * M * K * N
print(f"bf16:      {t_bf16*1e6:8.1f}us  {flops/t_bf16/1e12:6.1f} TFLOP/s")
print(f"int8 raw:  {t_i8*1e6:8.1f}us  {flops/t_i8/1e12:6.1f} TOP/s")
print(f"int8 dynq: {t_dynq*1e6:8.1f}us  {flops/t_dynq/1e12:6.1f} TOP/s-equiv")
