"""U-JiT: U-ViT-style skip connections (arXiv 2209.12152).

Rebuild of reference ``src/models/jit/extension/uvit.py``: down/mid/up/out
block lists where up blocks merge a concat skip through a Linear; blocks use
configurable pre/post/sandwich norm placement. Context tokens are appended
before and stripped after every block (or fused once when do_context_fuse).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import DenoiserConfig, JiTConfig
from ..denoiser import Attention, JiT, SwiGLU, _linear
from ..pipeline import JiTModel
from ....ops.norm import get_norm_layer

NormPosition = Literal["pre", "post", "sandwich"]


class UJiTBlock(nnx.Module):
    """Sandwich-norm block with optional concat-skip merge
    (reference ``uvit.py:30-146``)."""

    def __init__(
        self,
        hidden_dim: int,
        num_heads: int,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        qk_norm: bool = True,
        use_bias: bool = True,
        has_skip_connection: bool = False,
        eps: float = 1e-6,
        positional_encoding: str = "rope",
        norm_type: str = "rms",
        norm_position: NormPosition = "sandwich",
        attn_dropout: float = 0.0,
        proj_dropout: float = 0.0,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.has_pre_norm = norm_position in ("pre", "sandwich")
        self.has_post_norm = norm_position in ("post", "sandwich")
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.skip_merge = (
            _linear(hidden_dim * 2, hidden_dim, use_bias=use_bias, **kw)
            if has_skip_connection else None
        )

        def norm():
            return get_norm_layer(norm_type, hidden_dim, eps=eps,
                                  param_dtype=param_dtype)

        self.norm_attn_pre = norm() if self.has_pre_norm else None
        self.norm_attn_post = norm() if self.has_post_norm else None
        attention_class = Attention
        if positional_encoding in ("pope", "n-pope"):
            from .pope import PopeAttention

            attention_class = PopeAttention
        # attention qk norms are always rms (reference ``uvit.py:73-91``)
        self.attn = attention_class(
            dim=hidden_dim, num_heads=num_heads, qkv_bias=qkv_bias,
            qk_norm=qk_norm, attn_dropout=attn_dropout,
            proj_dropout=proj_dropout, norm_type="rms", **kw,
        )
        self.norm_mlp_pre = norm() if self.has_pre_norm else None
        self.norm_mlp_post = norm() if self.has_post_norm else None
        self.mlp = SwiGLU(hidden_dim, int(hidden_dim * mlp_ratio),
                          use_bias=use_bias, **kw)

    def __call__(self, hidden_states, rope_freqs, skip_hidden_states=None,
                 kv_lens=None, key_mask=None):
        if skip_hidden_states is not None:
            hidden_states = self.skip_merge(
                jnp.concatenate([hidden_states, skip_hidden_states], axis=-1)
            )
        h = hidden_states
        a = self.norm_attn_pre(h) if self.norm_attn_pre is not None else h
        a = self.attn(a, rope_freqs, kv_lens=kv_lens, key_mask=key_mask)
        if self.norm_attn_post is not None:
            a = self.norm_attn_post(a)
        h = h + a
        m = self.norm_mlp_pre(h) if self.norm_mlp_pre is not None else h
        m = self.mlp(m)
        if self.norm_mlp_post is not None:
            m = self.norm_mlp_post(m)
        return h + m


class UJiTDenoiserConfig(DenoiserConfig):
    num_blocks: int = 12
    norm_position: NormPosition = "sandwich"


class UJiT(JiT):
    """Reference ``uvit.py:155-577``. down blocks record full-token skips
    (context included); up blocks merge them via skip_merge."""

    def _build_blocks(self, config: UJiTDenoiserConfig, *, dtype, param_dtype,
                      rngs: nnx.Rngs):
        depth = config.depth
        num_out = config.num_blocks - (depth * 2 + 1)
        assert num_out >= 0, "num_blocks must be at least depth * 2 + 1"
        kw = dict(
            hidden_dim=config.hidden_size,
            num_heads=config.num_heads,
            mlp_ratio=config.mlp_ratio,
            attn_dropout=config.attn_dropout,
            proj_dropout=config.proj_dropout,
            qkv_bias=True, qk_norm=True, use_bias=True, eps=1e-6,
            positional_encoding=config.positional_encoding,
            norm_type=config.norm_type,
            norm_position=config.norm_position,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.down_blocks = nnx.List(
            [UJiTBlock(has_skip_connection=False, **kw) for _ in range(depth)]
        )
        self.mid_block = UJiTBlock(has_skip_connection=False, **kw)
        self.up_blocks = nnx.List(
            [UJiTBlock(has_skip_connection=True, **kw) for _ in range(depth)]
        )
        self.out_blocks = nnx.List(
            [UJiTBlock(has_skip_connection=False, **kw) for _ in range(num_out)]
        )
        self.blocks = None

    def _run_block(self, block, tokens, context_embed, freqs, kv_lens,
                   key_mask, skip_tokens=None):
        """Append context, run, record full tokens, strip context
        (reference ``uvit.py:343-384``)."""
        cfg = self.config
        if not cfg.do_context_fuse:
            tokens = jnp.concatenate([tokens, context_embed], axis=1)
        seq = tokens.shape[1]
        tokens = block(
            tokens, freqs[:seq], skip_hidden_states=skip_tokens,
            kv_lens=kv_lens, key_mask=key_mask[:, :seq] if key_mask is not None else None,
        )
        full = tokens
        if not cfg.do_context_fuse:
            tokens = tokens[:, : -context_embed.shape[1], :]
        return tokens, full

    def __call__(self, image, timestep, context, original_size, target_size,
                 crop_coords, context_mask=None):
        cfg = self.config
        height, width = image.shape[1], image.shape[2]
        (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        ) = self._prepare_inputs(
            image, timestep, context, original_size, target_size, crop_coords,
            context_mask,
        )
        if cfg.do_context_fuse:
            tokens = jnp.concatenate([tokens, context_embed], axis=1)

        skips = []
        for block in self.down_blocks:
            tokens, full = self._run_block(
                block, tokens, context_embed, freqs, kv_lens_full,
                key_mask_full,
            )
            skips.append(full)
        tokens, _ = self._run_block(
            self.mid_block, tokens, context_embed, freqs, kv_lens_full,
            key_mask_full,
        )
        for block in self.up_blocks:
            skip = skips.pop()
            if not cfg.do_context_fuse:
                pass  # skip includes context; block input re-appends context
            tokens, _ = self._run_block(
                block, tokens, context_embed, freqs, kv_lens_full,
                key_mask_full, skip_tokens=skip,
            )
        for block in self.out_blocks:
            tokens, _ = self._run_block(
                block, tokens, context_embed, freqs, kv_lens_full,
                key_mask_full,
            )

        patches = tokens[:, :patches_len, :]
        patches = self.final_layer(patches)
        return self.unpatchify(patches, height, width)


class Denoiser(UJiT):
    pass


class UJiTConfig(JiTConfig):
    denoiser: UJiTDenoiserConfig = UJiTDenoiserConfig()


class UJiTModel(JiTModel):
    denoiser_class = Denoiser
