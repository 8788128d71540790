"""Ring attention: sequence-parallel attention over a mesh axis.

The reference has NO sequence/context parallelism (SURVEY §5 "long-context"
— its only long-sequence levers are flash attention, per-block remat and
offload). On TPU the idiomatic equivalent is a *ring*: shard the sequence
axis across a mesh axis, keep each device's Q block resident, and rotate
K/V shards around the ring with ``jax.lax.ppermute`` over ICI while
accumulating a streaming (flash-style) softmax in fp32. Communication
overlaps compute step-for-step and per-device memory is
O(S_local² + S_local·D) instead of O(S²).

This unlocks image resolutions whose token counts exceed one chip
(>2k² pixels ⇒ S>16k for SDXL latents): not needed for reference parity,
flagged as the stretch goal in SURVEY §5.

Differentiation: the ring loop is a ``lax.scan`` whose body is pure JAX
(``ppermute`` is its own transpose with the inverted permutation), so
reverse-mode AD composes; the block update is ``jax.checkpoint``-ed so the
O(S_local²) score blocks are recomputed in the backward pass, not stored.
No Pallas here by design — the per-block attention math inside a shard is
exactly the XLA pattern the compiler already fuses at these block sizes
(see ops/attention.py dispatch notes); the ring is about *memory and
scale-out*, not single-chip speed.

Layout: block-local q/k/v are (B, S_local, H, D) — the same BSHD layout as
``dot_product_attention``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(
    q: jax.Array,  # (B, S_local, H, D) — this device's sequence shard
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    kv_lens: jax.Array | None = None,  # (B,) GLOBAL valid key length
    scale: float | None = None,
) -> jax.Array:
    """Non-causal ring attention body. Call inside ``shard_map`` with q/k/v
    sharded along ``axis_name`` on their sequence dim (see
    ``ring_attention_sharded`` for the wrapper).

    kv_lens masks *global* key positions >= kv_lens[b] (suffix padding, the
    same contract as the flash kernel in ops/flash_attention.py).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @jax.checkpoint
    def block_update(o, m, l, k_blk, v_blk, blk_mask):
        """Streaming-softmax update with one incoming K/V block. o is the
        fp32 accumulator (B,Sq,H,D); m/l the running row max / normalizer
        (B,H,Sq)."""
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        if blk_mask is not None:
            s = jnp.where(blk_mask[:, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # fully-masked rows keep m = -inf; guard exp against (-inf)-(-inf)
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        corr = jnp.exp(m - safe_m)  # (B,H,Sq)
        p = jnp.exp(s - safe_m[..., None])  # (B,H,Sq,Sk) fp32
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        o = o * corr.transpose(0, 2, 1)[..., None] + pv
        return o, m_new, l

    o0 = jnp.zeros((b, s_local, h, d), dtype=jnp.float32)
    m0 = jnp.full((b, h, s_local), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, s_local), dtype=jnp.float32)

    def step_update(o, m, l, k_blk, v_blk, step):
        # the block at ring step t on device d originated at device
        # (d - t) mod n — that fixes its keys' global positions
        blk_mask = None
        if kv_lens is not None:
            owner = (my_idx - step) % n_dev
            pos = owner * s_local + jnp.arange(s_local)
            blk_mask = pos[None, :] < kv_lens[:, None]
        return block_update(o, m, l, k_blk, v_blk, blk_mask)

    def body(carry, step):
        o, m, l, k_blk, v_blk = carry
        o, m, l = step_update(o, m, l, k_blk, v_blk, step)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (o, m, l, k_blk, v_blk), None

    # scan n-1 update+rotate steps; the final block is consumed without a
    # rotation (its rotated shards would be discarded — one wasted pair of
    # ICI collectives per call, doubled again under reverse-mode AD)
    (o, m, l, k_last, v_last), _ = jax.lax.scan(
        body, (o0, m0, l0, k, v), jnp.arange(n_dev - 1)
    )
    o, m, l = step_update(o, m, l, k_last, v_last, n_dev - 1)
    # rows with zero valid keys (possible under kv_lens) divide by l=0 -> 0
    l = jnp.where(l == 0.0, 1.0, l)
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array,  # (B, S, H, D) global arrays (or sharded along S)
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "seq",
    kv_lens: jax.Array | None = None,
    scale: float | None = None,
    batch_axes: tuple[str, ...] = (),
) -> jax.Array:
    """shard_map wrapper: shards the sequence axis of q/k/v over
    ``mesh[axis_name]`` and runs the ring. S must divide evenly by the axis
    size (pad the sequence and pass kv_lens otherwise).

    ``batch_axes`` optionally keeps the batch dim sharded over those mesh
    axes (the trainer's data x fsdp layout) instead of gathering it — each
    (data, fsdp) coordinate then runs its own independent seq ring. Ignored
    when the batch doesn't divide evenly (e.g. direct op-level calls)."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis_name]
    assert q.shape[1] % n == 0, (
        f"sequence {q.shape[1]} not divisible by mesh axis {axis_name}={n}; "
        "pad the sequence and pass kv_lens"
    )
    import numpy as _np

    b_shards = int(_np.prod([mesh.shape[a] for a in batch_axes])) \
        if batch_axes else 1
    if b_shards > 1 and q.shape[0] % b_shards != 0:
        batch_axes = ()
    b_spec = tuple(batch_axes) if batch_axes else None
    seq_spec = P(b_spec, axis_name, None, None)

    fn = functools.partial(ring_attention, axis_name=axis_name, scale=scale)
    if kv_lens is None:
        sharded = shard_map(
            lambda q, k, v: fn(q, k, v),
            mesh=mesh,
            in_specs=(seq_spec, seq_spec, seq_spec),
            out_specs=seq_spec,
            check_rep=False,
        )
        return sharded(q, k, v)
    sharded = shard_map(
        lambda q, k, v, lens: fn(q, k, v, kv_lens=lens),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(b_spec)),
        out_specs=seq_spec,
        check_rep=False,
    )
    return sharded(q, k, v, kv_lens)
