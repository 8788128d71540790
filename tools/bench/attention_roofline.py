"""Measured roofline decomposition of the packed short-attention kernel at
the JiT-B/16 256^2 headline shape (VERDICT r4 item 3 evidence collector).

Produces the numbers behind docs/ATTENTION_ROOFLINE.md:
1. headline step time, and the same step with attention monkeypatched to
   identity -> the step's true attention share (XLA re-fuses around the
   identity, so the delta is a slight UNDER-estimate of the share).
2. isolated packed-kernel fwd+bwd time per layer (scan-chained, dispatch
   amortized).
3. MXU depth utilization: the QK^T contraction is depth D=64 on a 128-deep
   MXU; time identical batched dots at D=64 vs D=128 to measure the real
   penalty (not the nominal 2x).
4. VPU floor: the bounded-softmax elementwise sequence (scale, clip, exp2,
   mask, row-sum) over the exact (B*H, S, S) f32 tile volume, timed as an
   XLA fusion — the kernel cannot beat the VPU running just its own
   elementwise work.
5. HBM floor: bytes in/out of the kernel at 819 GB/s (v5e).

Run on an idle chip: python tools/bench/attention_roofline.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, S, H, D = 64, 298, 12, 64
E = H * D
S_PAD = 304  # kernel block rows (ceil to sublane multiple)
HBM_GBPS = 819.0  # v5e spec


def timed(fn, *args, reps=5):
    """min-of-reps wall time of fn(*args, i) closed by a scalar fetch; the
    rep index i varies the executed inputs (remote result-cache dodge)."""
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(i + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(fn, x0, n):
    """n dependent reps of fn inside one jit (CSE-proof via data dep);
    ``salt`` perturbs the carried value so no two runs execute on identical
    bits."""

    @jax.jit
    def run(x, salt):
        eps = (salt * 1e-6).astype(x.dtype)

        def body(c, _):
            c = fn(c + eps)
            return c, ()

        c, _ = jax.lax.scan(body, x, None, length=n)
        return (c.astype(jnp.float32).ravel()[:1]).sum()

    return run


def main():
    out = {}
    key = jax.random.key(0)

    # ---- 1. step share: headline vs attention->identity
    from vision_pt_tpu import benchmarks as bm
    from vision_pt_tpu.models.jit import denoiser as dn_mod
    from vision_pt_tpu.models.jit.config import JiT_B_16_Config

    def measure_step():
        state, pure_step, images, context, k0 = bm._jit_train_setup(
            JiT_B_16_Config(), B, 256,
            dtype=jnp.bfloat16, param_dtype=jnp.float32,
        )
        state, loss = pure_step(state, images, context, k0)
        float(loss)
        box = {"s": state}

        def run(i):
            box["s"], loss = pure_step(box["s"], images, context,
                                       jax.random.fold_in(k0, i))
            return loss

        sec = bm.time_steps(run, steps=15)
        return sec

    t_step = measure_step()
    out["step_ms"] = round(t_step * 1e3, 2)
    out["headline_img_s"] = round(B / t_step, 1)

    # patch the DENOISER module's imported names (module-level ``from``
    # imports): the headline path calls short_attention_packed directly,
    # the non-packed paths go through dot_product_attention
    real_dpa = dn_mod.dot_product_attention
    real_packed = dn_mod.short_attention_packed

    def identity_attention(q, k, v, *args, **kwargs):
        return v

    def identity_packed(q, k, v, num_heads, kv_lens=None, **kwargs):
        return v

    dn_mod.dot_product_attention = identity_attention
    dn_mod.short_attention_packed = identity_packed
    try:
        t_noattn = measure_step()
    finally:
        dn_mod.dot_product_attention = real_dpa
        dn_mod.short_attention_packed = real_packed
    out["step_noattn_ms"] = round(t_noattn * 1e3, 2)
    out["attention_share_ms"] = round((t_step - t_noattn) * 1e3, 2)

    # ---- 2. isolated kernel fwd+bwd per layer
    from vision_pt_tpu.ops.short_attention import short_attention_packed

    q = jax.random.normal(key, (B, S, E), dtype=jnp.bfloat16)

    def layer_fwd_bwd(x):
        def loss_fn(q):
            o = short_attention_packed(q, q, q, H, bounded=True)
            return (o.astype(jnp.float32) ** 2).sum() * 1e-6, o

        (l, o), g = jax.value_and_grad(loss_fn, has_aux=True)(x)
        return (o + g).astype(x.dtype)

    n_lay = 12
    run12 = chain(layer_fwd_bwd, q, n_lay)
    float(run12(q, jnp.float32(0)))
    t12 = timed(run12, q)
    out["kernel_fwdbwd_ms_per_layer"] = round(t12 / n_lay * 1e3, 3)
    out["kernel_fwdbwd_ms_12_layers"] = round(t12 * 1e3, 2)

    # ---- 2b. dots-only packed kernel, in BOTH schedules: the same MXU
    # contraction topology as the real fwd+bwd with every softmax/mask/exp2
    # elementwise pass removed. ``paired`` mirrors the production schedule
    # (head-paired block-diagonal operands, commit 4098859); ``per_head``
    # is the pre-pairing schedule kept as the A/B reference.
    # kernel_minus_dots (vs paired) is the kernel's VPU share; dots_only is
    # its MXU floor at these shapes.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    def _dots_only_kernel(q_ref, k_ref, v_ref, do_ref,
                          o_ref, dq_ref, dk_ref, dv_ref, *, heads, dim):
        for h in range(heads):
            sl = slice(h * dim, (h + 1) * dim)
            qh, kh, vh, doh = (q_ref[0, :, sl], k_ref[0, :, sl],
                               v_ref[0, :, sl], do_ref[0, :, sl])
            s = jax.lax.dot_general(   # fwd QK^T (depth D)
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = jax.lax.dot_general(   # fwd PV (depth S)
                s.astype(qh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2 = jax.lax.dot_general(  # bwd QK^T recompute (depth D)
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = s2.astype(qh.dtype)
            dv = jax.lax.dot_general(  # p^T do (depth S)
                p, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(  # do v^T (depth D)
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = dp.astype(qh.dtype)
            dq = jax.lax.dot_general(  # ds k (depth S)
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(  # ds^T q (depth S)
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)

    def _dots_only_paired_kernel(q_ref, k_ref, v_ref, do_ref,
                                 o_ref, dq_ref, dk_ref, dv_ref,
                                 *, heads, dim):
        # fwd: s_pair + o_pair (2 dots); bwd: s recompute + dv + dp + dq
        # + dk (5 dots) — 7 paired dots == production topology
        z = jnp.zeros((S_PAD, dim), q_ref.dtype)
        for hp in range(heads // 2):
            sl = slice(hp * 2 * dim, (hp + 1) * 2 * dim)
            q2, k2, v2, do2 = (q_ref[0, :, sl], k_ref[0, :, sl],
                               v_ref[0, :, sl], do_ref[0, :, sl])
            kblk = jnp.concatenate(
                [jnp.concatenate([k2[:, :dim], z], 1),
                 jnp.concatenate([z, k2[:, dim:]], 1)], 0)
            vblk = jnp.concatenate(
                [jnp.concatenate([v2[:, :dim], z], 1),
                 jnp.concatenate([z, v2[:, dim:]], 1)], 0)
            s = jax.lax.dot_general(   # fwd scores (S, 2S), depth 2D
                q2, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = s.astype(q2.dtype)
            o = jax.lax.dot_general(   # fwd out (S, 2D), depth 2S
                e, vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2 = jax.lax.dot_general(  # bwd score recompute
                q2, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = s2.astype(q2.dtype)
            dvj = jax.lax.dot_general(  # (2S, 2D) junk-half dv
                p, do2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(   # (S, 2S), depth 2D
                do2, vblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = dp.astype(q2.dtype)
            dq = jax.lax.dot_general(   # (S, 2D), depth 2S
                ds, kblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dkj = jax.lax.dot_general(  # (2S, 2D) junk-half dk
                ds, q2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = jnp.concatenate(
                [dkj[:S_PAD, :dim], dkj[S_PAD:, dim:]], 1
            ).astype(dk_ref.dtype)
            dv_ref[0, :, sl] = jnp.concatenate(
                [dvj[:S_PAD, :dim], dvj[S_PAD:, dim:]], 1
            ).astype(dv_ref.dtype)

    def dots_variant(kernel):
        spec = pl.BlockSpec((1, S_PAD, E), lambda b: (b, 0, 0))

        def call(x):
            o, dq, dk, dv = pl.pallas_call(
                functools.partial(kernel, heads=H, dim=D),
                grid=(B,),
                in_specs=[spec, spec, spec, spec],
                out_specs=[spec, spec, spec, spec],
                out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 4,
            )(x, x, x, x)
            return (o + dq + dk + dv).astype(x.dtype)

        return call

    qp = jax.random.normal(key, (B, S_PAD, E), dtype=jnp.bfloat16)
    # USEFUL flops — identical for both schedules (7 production dots:
    # fwd s+o, bwd s2+dv+dp+dq+dk). The paired schedule additionally
    # multiplies the zero halves of its block-diagonal operands (2x MACs
    # executed on 4 of 7 dots) yet finishes sooner — MXU time at these
    # shapes is pass-count-bound, not MAC-bound, which is the whole lever.
    useful_flops = 7 * 2 * B * H * S_PAD * S_PAD * D
    td = None
    for name, kern in [("per_head", _dots_only_kernel),
                       ("paired", _dots_only_paired_kernel)]:
        rund = chain(dots_variant(kern), qp, n_lay)
        float(rund(qp, jnp.float32(0)))
        t = timed(rund, qp) / n_lay
        out[f"dots_only_{name}_ms_per_layer"] = round(t * 1e3, 3)
        out[f"dots_only_{name}_useful_tflops"] = round(
            useful_flops / t / 1e12, 1)
        if name == "paired":
            td = t
    out["kernel_minus_dots_ms_per_layer"] = round(
        (t12 / n_lay - td) * 1e3, 3
    )

    # ---- 3. MXU depth-64 vs depth-128 batched dot (QK^T shape)
    def bdot(d):
        a = jax.random.normal(key, (B * H, S_PAD, d), dtype=jnp.bfloat16)

        def one(x):
            s = jax.lax.dot_general(
                x, x, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (BH, S, S)
            # feed S x S back to S x d so the scan carries constant shape
            r = jax.lax.dot_general(
                s.astype(jnp.bfloat16), x, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return r.astype(jnp.bfloat16)

        runk = chain(one, a, 8)
        float(runk(a, jnp.float32(0)))
        t = timed(runk, a) / 8
        flops = 2 * 2 * (B * H) * S_PAD * S_PAD * d  # two dots
        return t, flops / t / 1e12

    t64, tf64 = bdot(64)
    t128, tf128 = bdot(128)
    out["qk_pv_dot_d64_ms"] = round(t64 * 1e3, 3)
    out["qk_pv_dot_d64_tflops"] = round(tf64, 1)
    out["qk_pv_dot_d128_ms"] = round(t128 * 1e3, 3)
    out["qk_pv_dot_d128_tflops"] = round(tf128, 1)

    # ---- 4. VPU floor: the bounded-softmax elementwise chain on the
    # exact f32 tile volume (B*H, S_PAD, S_PAD)
    tile = jax.random.normal(key, (B * H, S_PAD, S_PAD), dtype=jnp.float32)

    def softmax_elem(s):
        e = jnp.exp2(jnp.clip(s * 1.06, -86.0, 86.0))
        denom = jnp.maximum(e.sum(axis=-1, keepdims=True), 2.0**-100)
        return (e / denom).astype(jnp.float32)

    runv = chain(softmax_elem, tile, 4)
    float(runv(tile, jnp.float32(0)))
    tv = timed(runv, tile) / 4
    out["vpu_softmax_ms_per_tile_pass"] = round(tv * 1e3, 3)

    # ---- 5. HBM floor
    per_tensor = B * S * E * 2  # bf16
    fwd_bytes = 4 * per_tensor          # read q,k,v + write o
    bwd_bytes = 7 * per_tensor          # read q,k,v,do + write dq,dk,dv
    out["hbm_ms_per_layer_floor"] = round(
        (fwd_bytes + bwd_bytes) / (HBM_GBPS * 1e9) * 1e3, 3
    )

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
