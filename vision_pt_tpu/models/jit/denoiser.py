"""JiT pixel-space rectified-flow Diffusion Transformer, TPU-native.

Rebuild of the reference's ``src/models/jit/denoiser.py`` (itself after
LTH14/JiT). Architectural semantics match the reference; the implementation is
JAX/NNX-first:

- Images are **NHWC**; the strided patch-embed conv becomes patchify + matmul
  (identical math, lands directly on the MXU with no conv lowering).
- RoPE angles are computed directly from position ids at trace time (NumPy,
  static shapes) instead of table-build + gather — gathers are expensive on
  TPU and the gathered value *is* ``pos * omega``.
- Attention runs through :func:`vision_pt_tpu.ops.attention.dot_product_attention`
  (Pallas flash on TPU with suffix key-padding, XLA fallback elsewhere).
- Token sequence = [patches, imagesize(6), time(num_time_tokens), context],
  context injected at ``context_start_block`` and optionally re-appended/
  stripped per block (``do_context_fuse``), exactly as the reference
  (``denoiser.py:1012-1113``).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.attention import (
    _on_tpu,
    dot_product_attention,
    get_sequence_parallel,
)
from ...ops.short_attention import MAX_SHORT_SEQ, short_attention_packed
from ...ops.norm import FP32RMSNorm, get_norm_layer
from ...ops.patch import patchify, pixel_shuffle_nhwc, unpatchify
from ...ops.timestep.embedding import get_timestep_embedding
from .config import DenoiserConfig

Initializer = nnx.initializers.Initializer

_normal_init = nnx.initializers.normal(stddev=0.02)
_zeros_init = nnx.initializers.zeros_init()


def _linear(din, dout, *, use_bias=True, dtype, param_dtype, rngs):
    """Linear with the reference's init (normal 0.02 / zero bias,
    ``denoiser.py:764-798``)."""
    return nnx.Linear(
        din,
        dout,
        use_bias=use_bias,
        kernel_init=_normal_init,
        bias_init=_zeros_init,
        dtype=dtype,
        param_dtype=param_dtype,
        rngs=rngs,
    )


class BottleneckPatchEmbed(nnx.Module):
    """Patch embedding via bottleneck (reference ``denoiser.py:17-67``).

    The reference's stride-P conv + 1x1 conv are two matmuls over flattened
    patches here. ``proj_1`` has no bias, ``proj_2`` does — matching the
    reference exactly so converted weights line up.
    """

    def __init__(
        self,
        patch_size: int = 16,
        in_channels: int = 3,
        bottleneck_dim: int = 128,
        hidden_dim: int = 768,
        use_bias: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.patch_size = patch_size
        self.proj_1 = _linear(
            in_channels * patch_size * patch_size,
            bottleneck_dim,
            use_bias=False,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.proj_2 = _linear(
            bottleneck_dim,
            hidden_dim,
            use_bias=use_bias,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, image: jax.Array) -> jax.Array:
        """NHWC image -> (B, num_patches, hidden)."""
        patches = patchify(image, self.patch_size).patches  # (B, N, P*P*C)
        return self.proj_2(self.proj_1(patches))


class TimestepEmbedder(nnx.Module):
    """Sinusoid (flip_sin_to_cos=True, shift=0) + MLP
    (reference ``denoiser.py:70-95``)."""

    def __init__(
        self,
        hidden_dim: int,
        freq_embedding_size: int = 256,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.freq_embedding_size = freq_embedding_size
        self.linear_1 = _linear(
            freq_embedding_size, hidden_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.linear_2 = _linear(
            hidden_dim, hidden_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, timestep: jax.Array) -> jax.Array:
        freq = get_timestep_embedding(
            timestep,
            embedding_dim=self.freq_embedding_size,
            flip_sin_to_cos=True,
            downscale_freq_shift=0,
        )
        freq = freq.astype(self.linear_1.kernel.value.dtype)
        return self.linear_2(jax.nn.silu(self.linear_1(freq)))


class RopeEmbedder:
    """Multi-axis rotary tables (reference ``denoiser.py:114-287``).

    Host-side / trace-time NumPy: position ids depend only on static shapes,
    so frequencies are constants inside the jitted step. Instead of building
    per-axis tables and gathering, angles are ``position * omega`` directly
    (mathematically identical to the reference's table lookup, including the
    zero-centered offset which cancels).
    """

    def __init__(
        self,
        rope_theta: float = 256.0,
        axes_dims: tuple[int, ...] = (32, 64, 64),
        axes_lens: tuple[int, ...] = (256, 128, 128),
        zero_centered: tuple[bool, ...] = (False, True, True),
    ):
        self.rope_theta = rope_theta
        self.axes_dims = tuple(axes_dims)
        self.axes_lens = tuple(axes_lens)
        self.zero_centered = tuple(zero_centered)
        self.num_axes = len(axes_dims)

    def _omega(self, dim: int) -> np.ndarray:
        return 1.0 / (
            self.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        )

    def __call__(self, position_ids: np.ndarray) -> np.ndarray:
        """(seq, n_axes) float positions -> (seq, head_dim//2, 2) cos/sin."""
        parts = []
        for i, dim in enumerate(self.axes_dims):
            angles = np.outer(
                position_ids[..., i].astype(np.float64), self._omega(dim)
            )
            parts.append(
                np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(
                    np.float32
                )
            )
        return np.concatenate(parts, axis=-2)

    def prepare_image_position_ids(
        self, height: int, width: int, patch_size: int, global_index: int
    ) -> np.ndarray:
        """Zero-centered (global, y, x) grid (reference ``denoiser.py:225-261``)."""
        h_patches = height // patch_size
        w_patches = width // patch_size
        pos = np.zeros((h_patches, w_patches, self.num_axes), dtype=np.float32)
        pos[:, :, 0] = global_index
        pos[:, :, 1] = np.arange(
            h_patches // 2 - h_patches, h_patches // 2, dtype=np.float32
        )[:, None]
        pos[:, :, 2] = np.arange(
            w_patches // 2 - w_patches, w_patches // 2, dtype=np.float32
        )[None, :]
        return pos.reshape(-1, self.num_axes)

    def prepare_context_position_ids(
        self, seq_len: int, global_index: int = 0
    ) -> np.ndarray:
        """(global, i, i) positions (reference ``denoiser.py:263-281``)."""
        pos = np.zeros((seq_len, self.num_axes), dtype=np.float32)
        pos[:, 0] = global_index
        pos[:, 1] = np.arange(seq_len)
        pos[:, 2] = np.arange(seq_len)
        return pos


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate-half RoPE; x is (B, S, H, D) in DEINTERLEAVED head-dim layout,
    freqs (S, D//2, 2).

    Numerically identical to the reference's interleaved complex multiply
    (``denoiser.py:98-111``) composed with a fixed per-head permutation of
    the q/k projection outputs — the permutation is folded into the weights
    at checkpoint conversion (``convert.py``, rope_head_dim) and is a no-op
    for fresh inits. Why: interleaved strided slices + pair re-interleave are
    lane-level shuffles the TPU VPU emulates expensively (measured 2.2x
    slower than rotate-half; RoPE was 13% of the JiT-B train step).
    """
    half = x.shape[-1] // 2
    # compute in x's dtype: cos/sin are in [-1, 1], so bf16 products lose
    # <0.5% relative — upcasting to fp32 quadrupled the HBM traffic of what
    # is a bandwidth-bound op (profiled at 12% of the train step)
    cos = freqs[..., 0].astype(x.dtype)  # (S, D//2)
    sin = freqs[..., 1].astype(x.dtype)
    cos_full = jnp.concatenate([cos, cos], axis=-1)[None, :, None, :]
    sin_full = jnp.concatenate([sin, sin], axis=-1)[None, :, None, :]
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos_full + rotated * sin_full


def _rms_rope(x: jax.Array, norm: FP32RMSNorm, rope_freqs: jax.Array):
    """RMS-normalized RoPE via the scalar-commutation identity
    ``rope((x/rms)·g) == rope(x·g)·(1/rms)`` (RoPE rotates channel pairs —
    an orthogonal, per-row map — so dividing by the per-row RMS scalar
    commutes through it; the per-channel gain must stay on the un-rotated
    side). Stats: squares in x's dtype, accumulated in fp32 on the MXU
    (for bf16 x the bf16 squaring error is ~2e-4 relative on the mean —
    ~20× below bf16's own representation error; fp32 x keeps fp32 squares,
    so the fp32 parity paths are exact)."""
    d = x.shape[-1]
    ones = jnp.full((d,), 1.0 / d, dtype=x.dtype)
    ms = jnp.einsum(
        "bshd,d->bsh", jnp.square(x), ones,
        preferred_element_type=jnp.float32,
    )
    inv = jax.lax.rsqrt(ms + norm.eps)[..., None]
    if norm.weight is not None:
        x = x * norm.weight.value.astype(x.dtype)
    return apply_rope(x, rope_freqs) * inv.astype(x.dtype)


# Dispatch switch for the packed short-sequence Pallas kernel below (A/B
# measurement + emergency fallback to the XLA remat path).
USE_PACKED_SHORT_ATTENTION = True
# Trace-time inference switch. History: with the max-subtracted softmax the
# packed kernel's win was fwd+bwd only (XLA ~2% faster forward-only;
# sampler A/B 2026-08-17: packed 50.2/50.9 vs XLA 52.3/51.5 steps/s) and
# samplers traced under this context manager. The bounded-logits softmax
# (see ops/short_attention.BOUNDED_LOGIT_CLIP) cut the kernel's forward
# ~20%, flipping the sampler A/B (2026-08-18: packed 55.2/55.6 vs XLA
# 52.9/52.3 steps/s, +5.5%), so samplers now use the packed kernel too and
# this switch remains only as an escape hatch / for A/B runs.
_PACKED_DISABLED = False


@contextlib.contextmanager
def packed_attention_disabled():
    """Disable the packed Pallas kernel for code traced inside this block
    (forward-only workloads — see measurement note above)."""
    global _PACKED_DISABLED
    prev = _PACKED_DISABLED
    _PACKED_DISABLED = True
    try:
        yield
    finally:
        _PACKED_DISABLED = prev
# Measured crossover on v5e (JiT-B/16 train step, packed/XLA img-s ratio by
# sequence length, same-session A/B 2026-08-17): S=106 -> 0.81, 186 -> 1.02,
# 238 -> 0.95, 298 -> 1.10, 442 -> 1.20. The win grows with S (the (S,S)
# VMEM-resident kernel amortizes its per-program overhead quadratically)
# but is noisy below ~250, so the gate stays conservative.
MIN_PACKED_SEQ = 256


class Attention(nnx.Module):
    """Self-attention with QKNorm + RoPE (reference ``denoiser.py:290-397``).

    q/k/v stay (B, S, H, D) end-to-end (the Pallas kernel's native layout).
    Key padding reaches the kernel as suffix kv_lens; the XLA fallback gets a
    boolean key mask.
    """

    def __init__(
        self,
        dim: int,
        num_heads: int = 8,
        qkv_bias: bool = True,
        qk_norm: bool = True,
        attn_dropout: float = 0.0,
        proj_dropout: float = 0.0,
        eps: float = 1e-6,
        norm_type: str = "rms",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_norm = (
            get_norm_layer(norm_type, self.head_dim, eps=eps, param_dtype=param_dtype)
            if qk_norm
            else None
        )
        self.k_norm = (
            get_norm_layer(norm_type, self.head_dim, eps=eps, param_dtype=param_dtype)
            if qk_norm
            else None
        )
        self.to_q = _linear(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_k = _linear(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_v = _linear(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_o = _linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def _split_heads(self, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim)

    def qk_logit_bound(self) -> jax.Array | None:
        """Provable upper bound on |attention logit| under QKNorm:
        sqrt(D) * max|g_q| * max|g_k| (RMS-normalized rows have L2 norm
        sqrt(D); RoPE preserves norms). The packed kernel's no-max softmax
        is exact while this stays <= BOUNDED_LOGIT_CLIP (60); monitor it
        during training to see clip activation coming. None without QKNorm
        or with gain-free norms."""
        q_w = getattr(self.q_norm, "weight", None) if self.q_norm is not None else None
        k_w = getattr(self.k_norm, "weight", None) if self.k_norm is not None else None
        if q_w is None or k_w is None:
            return None
        return (
            jnp.sqrt(jnp.float32(self.head_dim))
            * jnp.max(jnp.abs(q_w.value.astype(jnp.float32)))
            * jnp.max(jnp.abs(k_w.value.astype(jnp.float32)))
        )

    def _project_qkv(self, hidden_states, rope_freqs):
        q = self._split_heads(self.to_q(hidden_states))
        k = self._split_heads(self.to_k(hidden_states))
        v = self._split_heads(self.to_v(hidden_states))
        if (
            isinstance(self.q_norm, FP32RMSNorm)
            and isinstance(self.k_norm, FP32RMSNorm)
            and q.dtype != jnp.float32
        ):
            # fused RMSNorm+RoPE: rope((x/rms)·g) == rope(x·g)·(1/rms).
            # The RMS division is a per-row SCALAR and RoPE is linear, so it
            # commutes through the rotation; the gain is per-channel and
            # stays before it. This removes the fp32 upcast+normalize pass
            # on the (B,S,H,D) tensors — the mean-of-squares reduce becomes
            # an MXU matvec and the two multiplies fuse into RoPE's
            # elementwise chain. Measured on the JiT-B/16 256² headline step
            # (v5e, 2026-08-19): 133.0 → 122.0 ms (+9%, 485 → 525 img/s);
            # the plain q_norm/k_norm modules cost ~23 ms of that step
            # (ablation: the per-head fp32 RMS norms alone, not the block
            # norms, dominated the non-attention share).
            #
            # fp32 activations take the plain path: the fusion's entire win
            # is eliminating the upcast pass, and with fp32 inputs there is
            # nothing to eliminate — the standalone fp32 einsum reduce plus
            # the post-RoPE multiply instead BREAK the norm→rope elementwise
            # fusion. Measured A/B on the JiT-S 64² fp32 chained train step
            # (v5e, 2026-08-20, same session): fused 4124.7 vs plain 5115.9
            # img/s (−19%) — this was the entire r3→r4 jit_s_64_fp32_train
            # bench regression (5105.7 → 3980.5).
            q = _rms_rope(q, self.q_norm, rope_freqs)
            k = _rms_rope(k, self.k_norm, rope_freqs)
        else:
            # generic path: LayerNorm/DyT/Derf q-k norms don't commute with
            # the rotation (mean subtraction / nonlinearity), so normalize
            # first, then rotate
            if self.q_norm is not None:
                q = self.q_norm(q)
                k = self.k_norm(k)
            q = apply_rope(q, rope_freqs)
            k = apply_rope(k, rope_freqs)
        return q, k, v

    def __call__(
        self,
        hidden_states: jax.Array,  # (B, S, dim)
        rope_freqs: jax.Array,  # (S, head_dim//2, 2)
        kv_lens: jax.Array | None = None,  # (B,) suffix-valid key lengths
        key_mask: jax.Array | None = None,  # (B, S) bool, for XLA path
    ) -> jax.Array:
        b, s, _ = hidden_states.shape
        if (
            USE_PACKED_SHORT_ATTENTION
            and not _PACKED_DISABLED
            and key_mask is None
            and MIN_PACKED_SEQ <= s <= MAX_SHORT_SEQ
            and _on_tpu()
            # seq-parallel training shards S over the mesh's seq axis; the
            # ring path (dot_product_attention backend=auto) owns dispatch
            and get_sequence_parallel() is None
        ):
            # packed short-sequence kernel: (B, S, H, D) -> (B, S, H*D) is a
            # free reshape on both sides, so the pallas call adds no
            # relayouts — the cost that sank the transposing BHSD variants
            # (430 -> 378/406 img/s on the JiT-B headline). Measured on the
            # same chip/session: 432.4 (XLA remat) -> 471.6 img/s (+9.1%)
            # on the JiT-B 256^2 bf16 train step. PEFT/quant wrappers stay
            # honored: this path calls the projection modules themselves.
            q, k, v = self._project_qkv(hidden_states, rope_freqs)
            attn = short_attention_packed(
                q.reshape(b, s, -1),
                k.reshape(b, s, -1),
                v.reshape(b, s, -1),
                self.num_heads,
                kv_lens,
                # QKNorm bounds the logits (RoPE preserves norms), so the
                # kernel may skip the softmax max-subtraction — the largest
                # VPU cost on its (S, S) tile. ASSUMPTION: learned gains keep
                # sqrt(D)*max|g_q|*max|g_k| <= BOUNDED_LOGIT_CLIP (60); at
                # init the bound is sqrt(64) = 8 and gains would have to grow
                # ~7.5x to clip. qk_logit_bound() computes the live bound for
                # training-time monitoring (JiT.qk_logit_bound aggregates).
                bounded=self.q_norm is not None,
            )
            return self.to_o(attn.astype(hidden_states.dtype))
        q, k, v = self._project_qkv(hidden_states, rope_freqs)
        if kv_lens is not None:
            attn = dot_product_attention(q, k, v, kv_lens=kv_lens)
        elif key_mask is not None:
            attn = dot_product_attention(q, k, v, mask=key_mask, backend="xla")
        else:
            attn = dot_product_attention(q, k, v)
        attn = attn.astype(hidden_states.dtype).reshape(b, s, -1)
        return self.to_o(attn)


class SwiGLU(nnx.Module):
    """SwiGLU MLP with the 2/3 width rule (reference ``denoiser.py:481-506``)."""

    def __init__(
        self,
        dim: int,
        hidden_dim: int,
        use_bias: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        hidden_dim = int(hidden_dim * 2 / 3)
        self.w_1 = _linear(dim, hidden_dim, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w_2 = _linear(dim, hidden_dim, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w_3 = _linear(hidden_dim, dim, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.w_3(jax.nn.silu(self.w_1(x)) * self.w_2(x))


class FinalLayer(nnx.Module):
    """norm -> SwiGLU -> linear projection to patches
    (reference ``denoiser.py:509-543``)."""

    def __init__(
        self,
        hidden_dim: int,
        mlp_ratio: float,
        patch_size: int,
        out_channels: int,
        eps: float = 1e-6,
        norm_type: str = "rms",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.norm_final = get_norm_layer(norm_type, hidden_dim, eps=eps, param_dtype=param_dtype)
        self.mlp = SwiGLU(hidden_dim, int(hidden_dim * mlp_ratio), dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear = _linear(
            hidden_dim, patch_size * patch_size * out_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.linear(self.mlp(self.norm_final(x)))


class BottleneckFinalLayer(nnx.Module):
    """norm -> bottleneck -> projection (reference ``denoiser.py:546-579``)."""

    def __init__(
        self,
        hidden_dim: int,
        bottleneck_dim: int,
        patch_size: int,
        out_channels: int,
        norm_type: str = "rms",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.norm_final = get_norm_layer(norm_type, hidden_dim, eps=1e-6, param_dtype=param_dtype)
        self.proj_1 = _linear(hidden_dim, bottleneck_dim, use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_2 = _linear(
            bottleneck_dim, patch_size * patch_size * out_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.proj_2(self.proj_1(self.norm_final(x)))


class JiTBlock(nnx.Module):
    """Pre-norm attention + SwiGLU block (reference ``denoiser.py:582-649``)."""

    def __init__(
        self,
        hidden_dim: int,
        num_heads: int,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        qk_norm: bool = True,
        use_bias: bool = True,
        eps: float = 1e-6,
        positional_encoding: str = "rope",
        norm_type: str = "rms",
        attn_dropout: float = 0.0,
        proj_dropout: float = 0.0,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        attention_class = Attention
        if positional_encoding in ("pope", "n-pope"):
            from .extension.pope import PopeAttention

            attention_class = PopeAttention
        self.norm1 = get_norm_layer(norm_type, hidden_dim, eps=eps, param_dtype=param_dtype)
        self.attn = attention_class(
            dim=hidden_dim,
            num_heads=num_heads,
            qkv_bias=qkv_bias,
            qk_norm=qk_norm,
            attn_dropout=attn_dropout,
            proj_dropout=proj_dropout,
            eps=eps,
            norm_type=norm_type,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.norm2 = get_norm_layer(norm_type, hidden_dim, eps=eps, param_dtype=param_dtype)
        self.mlp = SwiGLU(
            hidden_dim, int(hidden_dim * mlp_ratio), use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(
        self,
        hidden_states: jax.Array,
        rope_freqs: jax.Array,
        kv_lens: jax.Array | None = None,
        key_mask: jax.Array | None = None,
    ) -> jax.Array:
        hidden_states = hidden_states + self.attn(
            self.norm1(hidden_states), rope_freqs, kv_lens=kv_lens, key_mask=key_mask
        )
        return hidden_states + self.mlp(self.norm2(hidden_states))


def _block_fn(block: JiTBlock, tokens, rope_freqs, kv_lens, key_mask):
    return block(tokens, rope_freqs, kv_lens=kv_lens, key_mask=key_mask)


_block_fn_remat = nnx.remat(_block_fn, static_argnums=())


class JiT(nnx.Module):
    """The JiT denoiser (reference ``denoiser.py:652-1124``)."""

    def __init__(
        self,
        config: DenoiserConfig,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert (config.hidden_size // config.num_heads) == sum(
            config.rope_axes_dims
        ), "sum(rope_axes_dims) must equal head_dim"
        self.config = config
        self.gradient_checkpointing = False

        self.patch_embedder = BottleneckPatchEmbed(
            patch_size=config.patch_size,
            in_channels=config.in_channels,
            bottleneck_dim=config.bottleneck_dim,
            hidden_dim=config.hidden_size,
            use_bias=True,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.time_embedder = TimestepEmbedder(
            hidden_dim=config.hidden_size,
            freq_embedding_size=256,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.time_position_embeds = nnx.Param(
            _normal_init(
                rngs.params(), (config.num_time_tokens, config.hidden_size), param_dtype
            )
        )
        self.image_size_embedder = TimestepEmbedder(
            hidden_dim=config.hidden_size,
            freq_embedding_size=256,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        if config.positional_encoding == "rope":
            self.rope_embedder = RopeEmbedder(
                rope_theta=config.rope_theta,
                axes_dims=tuple(config.rope_axes_dims),
                axes_lens=tuple(config.rope_axes_lens),
                zero_centered=tuple(config.rope_zero_centered),
            )
        elif config.positional_encoding in ("pope", "n-pope"):
            from .extension.pope import NormalizedPopeEmbedder, PopeEmbedder

            embedder_class = (
                NormalizedPopeEmbedder
                if config.positional_encoding == "n-pope"
                else PopeEmbedder
            )
            self.rope_embedder = embedder_class(
                pope_theta=config.rope_theta,
                axes_dims=tuple(config.rope_axes_dims),
                axes_lens=tuple(config.rope_axes_lens),
                zero_centered=tuple(config.rope_zero_centered),
                do_normalize=tuple(config.rope_do_normalize),
                normalize_by=config.rope_normalize_by,
            )
        else:
            raise ValueError(
                f"Unknown positional_encoding: {config.positional_encoding}"
            )

        self.context_embedder = _linear(
            config.context_dim, config.hidden_size, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self._build_blocks(config, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if config.use_output_bottleneck:
            self.final_layer = BottleneckFinalLayer(
                hidden_dim=config.hidden_size,
                bottleneck_dim=config.bottleneck_dim,
                patch_size=config.patch_size,
                out_channels=config.out_channels,
                norm_type="rms",
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )
        else:
            self.final_layer = FinalLayer(
                hidden_dim=config.hidden_size,
                mlp_ratio=config.mlp_ratio,
                patch_size=config.patch_size,
                out_channels=config.out_channels,
                eps=1e-6,
                norm_type="rms",
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )

    def _build_blocks(self, config: DenoiserConfig, *, dtype, param_dtype,
                      rngs: nnx.Rngs):
        """Block-stack construction; extensions override this."""
        self.blocks = nnx.List(
            [
                JiTBlock(
                    hidden_dim=config.hidden_size,
                    num_heads=config.num_heads,
                    mlp_ratio=config.mlp_ratio,
                    attn_dropout=config.attn_dropout,
                    proj_dropout=config.proj_dropout,
                    qkv_bias=True,
                    qk_norm=True,
                    use_bias=True,
                    eps=1e-6,
                    positional_encoding=config.positional_encoding,
                    norm_type=config.norm_type,
                    dtype=dtype,
                    param_dtype=param_dtype,
                    rngs=rngs,
                )
                for _ in range(config.depth)
            ]
        )

    def set_gradient_checkpointing(self, enable: bool = True):
        self.gradient_checkpointing = enable

    def qk_logit_bound(self) -> jax.Array | None:
        """Max over blocks of Attention.qk_logit_bound — the model-level
        observable for the bounded-softmax assumption (log it periodically;
        see ops/short_attention.BOUNDED_LOGIT_CLIP)."""
        block_lists = [
            getattr(self, name, None)
            for name in ("blocks", "down_blocks", "mid_blocks", "up_blocks",
                         "out_blocks")
        ]
        bounds = [
            b for b in (
                blk.attn.qk_logit_bound()
                for blocks in block_lists if blocks is not None
                for blk in blocks
                if hasattr(blk, "attn") and hasattr(blk.attn, "qk_logit_bound")
            )
            if b is not None
        ]
        if not bounds:
            return None
        return jnp.max(jnp.stack(bounds))

    # -- static (trace-time) helpers -------------------------------------

    @functools.lru_cache(maxsize=64)
    def _freqs_for(self, height: int, width: int, context_len: int) -> np.ndarray:
        """Concatenated rotary table for the full token sequence; cached per
        static (H, W, context_len). Order: patches, imagesize, time, context
        (reference ``denoiser.py:1029-1051``)."""
        cfg = self.config
        patches_pos = self.rope_embedder.prepare_image_position_ids(
            height, width, cfg.patch_size, global_index=3
        )
        imagesize_pos = self.rope_embedder.prepare_context_position_ids(
            6, global_index=2
        )
        time_pos = self.rope_embedder.prepare_context_position_ids(
            cfg.num_time_tokens, global_index=1
        )
        context_pos = self.rope_embedder.prepare_context_position_ids(
            context_len, global_index=0
        )
        return np.concatenate(
            [
                self.rope_embedder(patches_pos),
                self.rope_embedder(imagesize_pos),
                self.rope_embedder(time_pos),
                self.rope_embedder(context_pos),
            ],
            axis=0,
        )

    # -- forward ----------------------------------------------------------

    def get_imagesize_embed(
        self,
        original_size: jax.Array,  # (B, 2)
        target_size: jax.Array,
        crop_coords: jax.Array,
    ) -> jax.Array:
        """Six size-conditioning tokens (reference ``denoiser.py:914-943``)."""
        size_info = jnp.concatenate(
            [original_size, target_size, crop_coords], axis=1
        )  # (B, 6)
        # batched embed (no reshape(-1): flattening batch into the token axis
        # forces an SPMD full remat when the batch axis is mesh-sharded)
        return self.image_size_embedder(size_info)

    def unpatchify(self, patches: jax.Array, height: int, width: int) -> jax.Array:
        """JiT's final-layer patches use (ph, pw, c) feature ordering — NOTE:
        this differs from ``modules/patch.py``'s (c, ph, pw); see reference
        ``denoiser.py:828-860`` view(B, h, w, P, P, C). The pixel-shuffle
        variant (``:862-891``) uses (c, ph, pw) ordering instead."""
        cfg = self.config
        p = cfg.patch_size
        gh, gw = height // p, width // p
        batch = patches.shape[0]
        if cfg.use_pixel_shuffle:
            x = patches.reshape(batch, gh, gw, -1)
            return pixel_shuffle_nhwc(x, p)
        x = patches.reshape(batch, gh, gw, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, P, gw, P, C)
        return x.reshape(batch, height, width, cfg.out_channels)

    def _prepare_inputs(
        self,
        image: jax.Array,
        timestep: jax.Array,
        context: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
        context_mask: jax.Array | None,
    ):
        """Shared token/freq/mask prep (reference ``denoiser.py:986-1085``);
        extensions reuse this. Returns (tokens, context_embed, freqs,
        kv_lens_full, key_mask_full, patches_len, prefix_len)."""
        cfg = self.config
        batch_size, height, width, _ = image.shape

        time_embed = self.time_embedder(timestep * cfg.timestep_scale)  # (B, D)
        time_tokens = (
            time_embed[:, None, :] + self.time_position_embeds.value[None, :, :]
        ).astype(time_embed.dtype)  # (B, T, D)
        num_time_tokens = time_tokens.shape[1]

        context_embed = self.context_embedder(context)
        context_len = context_embed.shape[1]

        imagesize_embed = self.get_imagesize_embed(
            original_size, target_size, crop_coords
        ).astype(time_embed.dtype)

        patches = self.patch_embedder(image)
        patches_len = patches.shape[1]

        freqs = jnp.asarray(self._freqs_for(height, width, context_len))

        # key-padding: tokens before context are always valid; context may be
        # right-padded. kv_lens drives the flash kernel; key_mask the XLA path.
        prefix_len = patches_len + 6 + num_time_tokens
        if context_mask is not None:
            ctx_valid = context_mask.astype(jnp.int32)
            kv_lens_full = prefix_len + jnp.sum(ctx_valid, axis=1)
            key_mask_full = jnp.concatenate(
                [
                    jnp.ones((batch_size, prefix_len), dtype=jnp.bool_),
                    context_mask.astype(jnp.bool_),
                ],
                axis=1,
            )
        else:
            kv_lens_full = None
            key_mask_full = None

        tokens = jnp.concatenate([patches, imagesize_embed, time_tokens], axis=1)
        return (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        )

    def __call__(
        self,
        image: jax.Array,  # (B, H, W, C) NHWC
        timestep: jax.Array,  # (B,)
        context: jax.Array,  # (B, context_len, context_dim)
        original_size: jax.Array,  # (B, 2) (H, W)
        target_size: jax.Array,  # (B, 2)
        crop_coords: jax.Array,  # (B, 2)
        context_mask: jax.Array | None = None,  # (B, context_len); right-padded
    ) -> jax.Array:
        cfg = self.config
        height, width = image.shape[1], image.shape[2]
        (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        ) = self._prepare_inputs(
            image, timestep, context, original_size, target_size, crop_coords,
            context_mask,
        )
        context_len = context_embed.shape[1]

        use_remat = self.gradient_checkpointing
        for i, block in enumerate(self.blocks):
            if i == cfg.context_start_block or (
                not cfg.do_context_fuse and i >= cfg.context_start_block
            ):
                tokens = jnp.concatenate([tokens, context_embed], axis=1)

            seq_len = tokens.shape[1]
            has_context = seq_len > prefix_len
            kv_lens = kv_lens_full if (has_context and kv_lens_full is not None) else None
            key_mask = (
                key_mask_full[:, :seq_len]
                if (has_context and key_mask_full is not None)
                else None
            )
            block_freqs = freqs[:seq_len]
            if use_remat:
                tokens = _block_fn_remat(block, tokens, block_freqs, kv_lens, key_mask)
            else:
                tokens = block(tokens, block_freqs, kv_lens=kv_lens, key_mask=key_mask)

            if not cfg.do_context_fuse and i >= cfg.context_start_block:
                tokens = tokens[:, :-context_len, :]

        patches = tokens[:, :patches_len, :]
        patches = self.final_layer(patches)
        return self.unpatchify(patches, height, width)


class Denoiser(JiT):
    """Alias used by checkpoints/pipelines (reference ``denoiser.py:1127-1130``)."""
