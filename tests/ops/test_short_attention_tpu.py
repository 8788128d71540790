"""Real-chip (non-interpret) validation of the packed short-attention kernel
at NON-8-ALIGNED sequence lengths (ADVICE r4 #1).

The unpadded-overrun design blocks rows past the array bound and relies on
Mosaic dropping OOB stores plus ``_zero_oob_rows`` defending against
unspecified OOB reads. Interpret-mode tests cannot validate those HARDWARE
semantics, and the headline shape (S=304) is 8-aligned, so this spawns a
fresh subprocess WITHOUT the suite's forced-CPU config and compiles the
kernel on the actual TPU at sq=sk=37 with kv_lens < sk, fwd+bwd, asserting
no NaNs and parity with the BHSD whole-sequence kernel.

Skips cleanly when no TPU is reachable (CI without the tunnel)."""

import os
import subprocess
import sys

import pytest

_PROBE = r"""
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
dev = jax.devices()[0]
assert "tpu" in dev.device_kind.lower() or dev.platform != "cpu", dev

from vision_pt_tpu.ops.short_attention import (
    short_attention,
    short_attention_packed,
)

b, s, h, d = 2, 37, 2, 64   # s % 8 != 0: exercises overrunning blocks
kq = jax.random.normal(jax.random.key(0), (b, s, h, d), dtype=jnp.bfloat16)
kk = jax.random.normal(jax.random.key(1), (b, s, h, d), dtype=jnp.bfloat16)
kv = jax.random.normal(jax.random.key(2), (b, s, h, d), dtype=jnp.bfloat16)
kv_lens = jnp.asarray([37, 21], dtype=jnp.int32)  # kv_lens < sk in row 1

def packed_loss(q, k, v):
    o = short_attention_packed(
        q.reshape(b, s, h * d), k.reshape(b, s, h * d),
        v.reshape(b, s, h * d), num_heads=h, kv_lens=kv_lens,
    )
    return (o.astype(jnp.float32) ** 2).sum(), o

def bshd_loss(q, k, v):
    o = short_attention(q, k, v, kv_lens=kv_lens)
    return (o.astype(jnp.float32) ** 2).sum(), o

(pl, po), pg = jax.jit(jax.value_and_grad(packed_loss, argnums=(0, 1, 2),
                                          has_aux=True))(kq, kk, kv)
(bl, bo), bg = jax.jit(jax.value_and_grad(bshd_loss, argnums=(0, 1, 2),
                                          has_aux=True))(kq, kk, kv)

po = np.asarray(po, dtype=np.float32).reshape(b, s, h, d)
bo = np.asarray(bo, dtype=np.float32)
assert np.isfinite(po).all(), "packed fwd produced non-finite values"
np.testing.assert_allclose(po, bo, atol=2e-2, rtol=2e-2)
for gp, gb, name in zip(pg, bg, "qkv"):
    gp = np.asarray(gp, dtype=np.float32).reshape(b, s, h, d)
    gb = np.asarray(gb, dtype=np.float32)
    assert np.isfinite(gp).all(), f"packed d{name} non-finite"
    np.testing.assert_allclose(gp, gb, atol=5e-2, rtol=5e-2)
print("TPU_PACKED_OK")
"""


@pytest.mark.slow
def test_packed_kernel_non_aligned_s_on_real_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo", env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU unreachable (probe timed out)")
    if "TPU_PACKED_OK" in proc.stdout:
        return
    err = (proc.stderr or "").strip().splitlines()
    tail = "\n".join(err[-15:])
    if "Backend" in tail or "No devices" in tail or "UNAVAILABLE" in tail:
        pytest.skip(f"TPU unreachable: {tail[-200:]}")
    raise AssertionError(
        f"packed kernel failed on real TPU (rc={proc.returncode}):\n{tail}"
    )
