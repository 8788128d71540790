import time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from flax import nnx
from vision_pt_tpu.ops.quant.layers import QuantLinear4bit

m, k, n = 64, 8192, 8192
lin = nnx.Linear(k, n, use_bias=False, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
qlin = QuantLinear4bit.from_linear(lin, quant_type="nf4")
xs = [jax.random.normal(jax.random.key(1+i), (m, k), dtype=jnp.bfloat16) for i in range(4)]

# correctness on-chip: Pallas kernel vs the XLA dequant path
from vision_pt_tpu.ops.quant.pallas_nf4 import dequant_matmul_4bit
y_pal = dequant_matmul_4bit(xs[0], qlin.packed.value, qlin.absmax.value)
ref = xs[0] @ qlin.dequantized_kernel(jnp.bfloat16)
err = float(jnp.max(jnp.abs(y_pal.astype(jnp.float32) - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref)))
print("max abs err:", err, "rel:", err/scale)

reps = 32
def make(layer):
    @nnx.jit
    def chained(layer, x):
        def body(x, _):
            y = layer(x)
            return x + y * jnp.bfloat16(1e-6), y.sum()
        x, ys = jax.lax.scan(body, x, None, length=reps)
        return ys.sum()
    chained(layer, xs[0])
    return chained

def time_steps(fn, steps=3, windows=3):
    best = float("inf"); c=0
    for _ in range(windows):
        t0=time.perf_counter(); out=None
        for _ in range(steps):
            out = fn(c); c+=1
        float(out)
        best = min(best, (time.perf_counter()-t0)/steps)
    return best

bf16 = make(lin); q4 = make(qlin)
t_bf16 = time_steps(lambda i: bf16(lin, xs[i % 4])) / reps
t_q4 = time_steps(lambda i: q4(qlin, xs[i % 4])) / reps
print(f"bf16: {t_bf16*1e6:.1f}us  nf4(bit-tree LUT): {t_q4*1e6:.1f}us  ratio: {t_bf16/t_q4:.3f}")
