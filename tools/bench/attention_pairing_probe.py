"""Measured A/B of head-PAIRED MXU scheduling for the packed short-attention
kernel (ATTENTION_ROOFLINE lever #1).

At the JiT-B headline shape the kernel's score dots contract over D=64 on a
128-deep MXU (half idle) and its output dots write D=64 of 128 lanes (half
idle). Pairing two heads fixes both:

  Q^ = [q_a | q_b]               (S, 128)   lane-concat
  Kb = [[k_a, 0], [0, k_b]]      (2S, 128)  block-diagonal
  Vb = [[v_a, 0], [0, v_b]]      (2S, 128)

  scores  = Q^ @ Kb^T  -> (S, 2S) = [s_a | s_b]     depth 128 (was 64)
  out     = P  @ Vb    -> (S, 128) = [o_a | o_b]    lanes 128 (was 64)
  dP      = DO^ @ Vb^T -> (S, 2S)                    depth 128 (was 64)
  dQ      = DS @ Kb    -> (S, 128)                   lanes 128 (was 64)
  dK / dV stay per-head-cost (junk half columns, sliced away on store).

Cycle model: 4 of 6 dots drop from 6S to 5S row-streams per pair -> ~11%
fewer MXU cycles, minus the VPU cost of building Kb/Vb and the segmented
delta reduction. This probe measures the real delta in isolation (dots-only
and full fwd+bwd) so the decision is evidence, not arithmetic.

Run: python tools/bench/attention_pairing_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, S, H, D = 64, 304, 12, 64  # headline shape, S pre-padded to sublane
E = H * D
LOG2E = 1.4426950408889634
CLIP = 60.0 * LOG2E
SCALE = D**-0.5


def timed(fn, *args, reps=5):
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(i + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(fn, x0, n):
    @jax.jit
    def run(x, salt):
        eps = (salt * 1e-6).astype(x.dtype)

        def body(c, _):
            return fn(c + eps), ()

        c, _ = jax.lax.scan(body, x, None, length=n)
        return (c.astype(jnp.float32).ravel()[:1]).sum()

    return run


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- baseline
# per-head fwd+bwd, the production schedule (mirrors _head_fwd/_head_bwd
# with bounded softmax)


def _base_kernel(q_ref, o_ref, dq_ref):
    q = q_ref[0]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh = q[:, sl]
        kh, vh, doh = qh, qh, qh
        s = _dot(qh, kh, ((1,), (1,))) * (SCALE * LOG2E)
        e = jnp.exp2(jnp.clip(s, -CLIP, CLIP))
        denom = jnp.maximum(e.sum(-1, keepdims=True), 2.0**-100)
        o = _dot(e.astype(vh.dtype), vh, ((1,), (0,))) / denom
        p = (e / denom)
        dv = _dot(p.astype(doh.dtype), doh, ((0,), (0,)))
        dp = _dot(doh, vh, ((1,), (1,)))
        delta = jnp.sum(p * dp, -1, keepdims=True)
        ds = (p * (dp - delta)).astype(kh.dtype)
        dq = _dot(ds, kh, ((1,), (0,))) * SCALE
        dk = _dot(ds, qh, ((0,), (0,))) * SCALE
        o_ref[0, :, sl] = (o + dv).astype(o_ref.dtype)
        dq_ref[0, :, sl] = (dq + dk).astype(dq_ref.dtype)


# ------------------------------------------------------------------ paired


def _paired_kernel(q_ref, o_ref, dq_ref):
    q = q_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * S), 1)
    first = col < S
    for hp in range(H // 2):
        sa = slice((2 * hp) * D, (2 * hp + 1) * D)
        sb = slice((2 * hp + 1) * D, (2 * hp + 2) * D)
        qa, qb = q[:, sa], q[:, sb]
        # lane-concat queries / block-diag keys+values (kv = q here; the
        # construction cost is what we are measuring)
        qcat = jnp.concatenate([qa, qb], axis=1)                  # (S, 128)
        z = jnp.zeros((S, D), q.dtype)
        kblk = jnp.concatenate(
            [jnp.concatenate([qa, z], 1), jnp.concatenate([z, qb], 1)], 0
        )                                                          # (2S,128)
        vblk = kblk
        docat = qcat
        s = _dot(qcat, kblk, ((1,), (1,))) * (SCALE * LOG2E)       # (S, 2S)
        e = jnp.exp2(jnp.clip(s, -CLIP, CLIP))
        # segmented row-sum per head half
        ea = jnp.where(first, e, 0.0)
        da = jnp.maximum(ea.sum(-1, keepdims=True), 2.0**-100)
        db = jnp.maximum((e - ea).sum(-1, keepdims=True), 2.0**-100)
        o = _dot(e.astype(q.dtype), vblk, ((1,), (0,)))            # (S, 128)
        o = jnp.concatenate([o[:, :D] / da, o[:, D:] / db], 1)
        p = e / jnp.where(first, da, db)
        dv = _dot(p.astype(q.dtype), docat, ((0,), (0,)))          # (2S,128)
        dp = _dot(docat, vblk, ((1,), (1,)))                       # (S, 2S)
        pdp = p * dp
        pa = jnp.where(first, pdp, 0.0)
        delta_a = pa.sum(-1, keepdims=True)
        delta_b = (pdp - pa).sum(-1, keepdims=True)
        ds = (p * (dp - jnp.where(first, delta_a, delta_b))).astype(q.dtype)
        dq = _dot(ds, kblk, ((1,), (0,))) * SCALE                  # (S, 128)
        dk = _dot(ds, qcat, ((0,), (0,))) * SCALE                  # (2S,128)
        o_ref[0, :, sa] = (o[:, :D] + dv[:S, :D]).astype(o_ref.dtype)
        o_ref[0, :, sb] = (o[:, D:] + dv[S:, D:]).astype(o_ref.dtype)
        dq_ref[0, :, sa] = (dq[:, :D] + dk[:S, :D]).astype(dq_ref.dtype)
        dq_ref[0, :, sb] = (dq[:, D:] + dk[S:, D:]).astype(dq_ref.dtype)


def run_variant(kernel_fn, x):
    spec = pl.BlockSpec((1, S, E), lambda b: (b, 0, 0))

    def call(v):
        o, dq = pl.pallas_call(
            kernel_fn,
            grid=(B,),
            in_specs=[spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype)] * 2,
        )(v)
        return (o + dq).astype(v.dtype)

    return call


def main():
    out = {}
    x = jax.random.normal(jax.random.key(0), (B, S, E), dtype=jnp.bfloat16)
    n = 12
    for name, kern in [("per_head", _base_kernel), ("paired", _paired_kernel)]:
        run = chain(run_variant(kern, x), x, n)
        float(run(x, jnp.float32(0)))
        t = timed(run, x) / n
        out[f"{name}_ms_per_layer"] = round(t * 1e3, 3)
    out["paired_speedup"] = round(
        out["per_head_ms_per_layer"] / out["paired_ms_per_layer"], 3
    )
    # numeric parity of the two schedules on identical inputs
    a = jax.jit(run_variant(_base_kernel, x))(x)
    b = jax.jit(run_variant(_paired_kernel, x))(x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    out["max_abs_diff"] = err
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
