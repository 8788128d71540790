"""SDXL UNet denoiser, TPU-native (rebuild of reference
``src/models/sdxl/denoiser.py``; sgm openaimodel lineage, checkpoint keys
match original single-file checkpoints through the converter).

JAX/NNX design notes:
- Latents are **NHWC** (XLA TPU conv-native layout). SpatialTransformer's
  NCHW<->tokens permutes vanish — NHWC to (B, H*W, C) is a plain reshape.
- Attention goes through the Pallas-flash/XLA dispatch in BSHD layout with no
  head transposes.
- Block structure exactly mirrors the reference's flattened
  input_blocks/middle_block/output_blocks lists so state-dict paths align
  one-to-one (reference ``denoiser.py:613-1005``), including the quirk that
  each up stage's Upsample lives inside the stage's last layer-list.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.attention import dot_product_attention
from ...ops.timestep.embedding import get_timestep_embedding
from .config import DenoiserConfig

# -------------------------------------------------------------- embedders


class MLPEmbedder(nnx.Module):
    """Linear -> SiLU -> Linear (reference ``denoiser.py:20-26``; torch keys
    .0/.2 map to linear_1/linear_2)."""

    def __init__(self, in_dim: int, hidden_dim: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.linear_1 = nnx.Linear(in_dim, hidden_dim, dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(hidden_dim, hidden_dim, dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


# -------------------------------------------------------------- attention


class SelfAttention(nnx.Module):
    """Reference ``denoiser.py:32-94``; q/k/v bias-free, out proj biased."""

    def __init__(self, num_heads: int, head_dim: int, dropout: float = 0.0,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = nnx.Linear(inner, inner, use_bias=False, **kw)
        self.to_k = nnx.Linear(inner, inner, use_bias=False, **kw)
        self.to_v = nnx.Linear(inner, inner, use_bias=False, **kw)
        self.to_out = nnx.Linear(inner, inner, **kw)

    def __call__(self, hidden_states: jax.Array, mask=None, **kwargs) -> jax.Array:
        b, s, _ = hidden_states.shape
        q = self.to_q(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(hidden_states).reshape(b, s, self.num_heads, self.head_dim)
        attn = dot_product_attention(q, k, v, mask=mask)
        return self.to_out(attn.astype(hidden_states.dtype).reshape(b, s, -1))


class CrossAttention(nnx.Module):
    """Reference ``denoiser.py:97-172``. ``cross_attention_kwargs`` /
    time_embedding plumbed through for IP-Adapter variants."""

    def __init__(self, query_dim: int, context_dim: int, num_heads: int,
                 head_dim: int, dropout: float = 0.0,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = nnx.Linear(query_dim, inner, use_bias=False, **kw)
        self.to_k = nnx.Linear(context_dim, inner, use_bias=False, **kw)
        self.to_v = nnx.Linear(context_dim, inner, use_bias=False, **kw)
        self.to_out = nnx.Linear(inner, query_dim, **kw)

    def __call__(self, query: jax.Array, context: jax.Array, mask=None,
                 time_embedding=None, **kwargs) -> jax.Array:
        b, s, _ = query.shape
        sk = context.shape[1]
        q = self.to_q(query).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(context).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.to_v(context).reshape(b, sk, self.num_heads, self.head_dim)
        attn = dot_product_attention(q, k, v, mask=mask)
        return self.to_out(attn.astype(query.dtype).reshape(b, s, -1))


class GeGLU(nnx.Module):
    """Gated GeLU (reference ``denoiser.py:175-186``)."""

    def __init__(self, in_dim: int, out_dim: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.proj = nnx.Linear(in_dim, out_dim * 2, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, gate = jnp.split(self.proj(x), 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nnx.Module):
    """GeGLU -> Linear (reference ``denoiser.py:189-207``; torch keys
    net.0.proj / net.2)."""

    def __init__(self, hidden_dim: int, multiplier: float = 4,
                 dropout: float = 0.0, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        inner = int(hidden_dim * multiplier)
        self.geglu = GeGLU(hidden_dim, inner, dtype=dtype,
                           param_dtype=param_dtype, rngs=rngs)
        self.out = nnx.Linear(inner, hidden_dim, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.out(self.geglu(x))


class TransformerBlock(nnx.Module):
    """self-attn -> cross-attn -> FF, pre-LN (reference
    ``denoiser.py:213-280``)."""

    self_attention_class = SelfAttention
    cross_attention_class = CrossAttention

    def __init__(self, hidden_dim: int, num_heads: int, head_dim: int,
                 context_dim: int = 2048, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn1 = self.self_attention_class(
            num_heads=num_heads, head_dim=head_dim, dropout=0.0, **kw
        )
        self.ff = FeedForward(hidden_dim=hidden_dim, dropout=0.0, **kw)
        self.attn2 = self.cross_attention_class(
            query_dim=hidden_dim, context_dim=context_dim,
            num_heads=num_heads, head_dim=head_dim, dropout=0.0, **kw
        )
        self.norm1 = nnx.LayerNorm(hidden_dim, param_dtype=param_dtype,
                                   dtype=dtype, rngs=rngs)
        self.norm2 = nnx.LayerNorm(hidden_dim, param_dtype=param_dtype,
                                   dtype=dtype, rngs=rngs)
        self.norm3 = nnx.LayerNorm(hidden_dim, param_dtype=param_dtype,
                                   dtype=dtype, rngs=rngs)

    def __call__(self, hidden_states: jax.Array, context: jax.Array,
                 time_embedding=None, cross_attention_kwargs=None,
                 **kwargs) -> jax.Array:
        hidden_states = hidden_states + self.attn1(self.norm1(hidden_states))
        hidden_states = hidden_states + self.attn2(
            self.norm2(hidden_states),
            context=context,
            time_embedding=time_embedding,
            **(cross_attention_kwargs or {}),
        )
        return hidden_states + self.ff(self.norm3(hidden_states))


class SpatialTransformer(nnx.Module):
    """GroupNorm + linear proj around N transformer blocks
    (reference ``denoiser.py:283-365``). In NHWC the token reshape is free."""

    def __init__(self, in_channels: int, num_heads: int, head_dim: int,
                 context_dims: list[int] = (2048,),
                 transformer_block_class=TransformerBlock,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        inner = num_heads * head_dim
        self.inner_dim = inner
        self.norm = nnx.GroupNorm(
            num_features=in_channels, num_groups=32, epsilon=1e-6,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs,
        )
        self.proj_in = nnx.Linear(in_channels, inner, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.transformer_blocks = nnx.List(
            [
                transformer_block_class(
                    hidden_dim=inner, num_heads=num_heads, head_dim=head_dim,
                    context_dim=cd, dtype=dtype, param_dtype=param_dtype,
                    rngs=rngs,
                )
                for cd in context_dims
            ]
        )
        self.proj_out = nnx.Linear(inner, in_channels, dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)

    def __call__(self, hidden_states: jax.Array, context=None,
                 time_embedding=None, transformer_args=None,
                 cross_attention_kwargs=None) -> jax.Array:
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        x = self.norm(hidden_states).reshape(b, h * w, c)
        x = self.proj_in(x)
        targs = dict(transformer_args or {})
        targs |= {"height": h, "width": w}
        for block in self.transformer_blocks:
            x = block(
                x,
                context=context,
                time_embedding=time_embedding,
                cross_attention_kwargs=cross_attention_kwargs,
                **targs,
            )
        x = self.proj_out(x)
        return x.reshape(b, h, w, self.inner_dim) + residual


# -------------------------------------------------------------- resnet path


def _conv(in_ch, out_ch, kernel, stride=1, padding=1, *, dtype, param_dtype, rngs):
    return nnx.Conv(
        in_ch, out_ch, kernel_size=(kernel, kernel),
        strides=(stride, stride), padding=padding,
        dtype=dtype, param_dtype=param_dtype, rngs=rngs,
    )


class Downsample(nnx.Module):
    """Stride-2 conv or avg-pool (reference ``denoiser.py:371-408``)."""

    def __init__(self, hidden_dim: int, out_channels: int, use_resample: bool,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.use_resample = use_resample
        self.op = (
            _conv(hidden_dim, out_channels, 3, stride=2, padding=1,
                  dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if use_resample
            else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.op is not None:
            return self.op(x)
        return nnx.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


class Upsample(nnx.Module):
    """Nearest x2 + conv (reference ``denoiser.py:411-453``)."""

    def __init__(self, hidden_dim: int, out_channels: int, use_resample: bool,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = (
            _conv(hidden_dim, out_channels, 3, padding=1,
                  dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if use_resample
            else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # nearest-neighbor x2 via repeat (exact torch 'nearest' semantics)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.conv is not None:
            x = self.conv(x)
        return x


class ResidualBlock(nnx.Module):
    """GroupNorm/SiLU/conv x2 with time-embed shift (reference
    ``denoiser.py:489-605``). updown variants are built but unused by SDXL's
    default config (the reference passes updown_type='none' everywhere)."""

    def __init__(self, hidden_dim: int, embedding_dim: int, dropout: float,
                 out_channels: int, updown_type: str = "none",
                 kernel_size: int = 3, num_norm_groups: int = 32,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.updown_type = updown_type
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.in_norm = nnx.GroupNorm(
            num_features=hidden_dim, num_groups=num_norm_groups, epsilon=1e-5,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs,
        )
        self.in_conv = _conv(hidden_dim, out_channels, kernel_size,
                             padding=kernel_size // 2, **kw)
        self.emb_linear = nnx.Linear(embedding_dim, out_channels, dtype=dtype,
                                     param_dtype=param_dtype, rngs=rngs)
        self.out_norm = nnx.GroupNorm(
            num_features=out_channels, num_groups=num_norm_groups, epsilon=1e-5,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs,
        )
        self.out_conv = _conv(out_channels, out_channels, kernel_size,
                              padding=kernel_size // 2, **kw)
        self.skip_connection = (
            _conv(hidden_dim, out_channels, 1, padding=0, **kw)
            if hidden_dim != out_channels
            else None
        )
        if updown_type == "down":
            self._updown = lambda x: nnx.avg_pool(
                x, window_shape=(2, 2), strides=(2, 2)
            )
        elif updown_type == "up":
            self._updown = lambda x: jnp.repeat(
                jnp.repeat(x, 2, axis=1), 2, axis=2
            )
        else:
            self._updown = None

    def __call__(self, hidden_states: jax.Array, embedding: jax.Array) -> jax.Array:
        residual = hidden_states
        h = jax.nn.silu(self.in_norm(hidden_states))
        if self._updown is not None:
            h = self._updown(h)
            residual = self._updown(residual)
        h = self.in_conv(h)
        emb = self.emb_linear(jax.nn.silu(embedding))
        h = h + emb[:, None, None, :].astype(h.dtype)
        h = self.out_conv(jax.nn.silu(self.out_norm(h)))
        if self.skip_connection is not None:
            residual = self.skip_connection(residual)
        return h + residual


# -------------------------------------------------------------- UNet blocks


class DownBlocksOutput(NamedTuple):
    hidden_states: jax.Array
    skip_connections: list[jax.Array]


def _apply_layer(layer, hidden_states, context, global_embedding,
                 time_embedding, transformer_args, cross_attention_kwargs):
    if isinstance(layer, ResidualBlock):
        return layer(hidden_states, global_embedding)
    if isinstance(layer, SpatialTransformer):
        return layer(
            hidden_states, context=context, time_embedding=time_embedding,
            transformer_args=transformer_args,
            cross_attention_kwargs=cross_attention_kwargs,
        )
    return layer(hidden_states)  # Conv stem / Downsample / Upsample


# per-layer rematerialization (reference per-block torch checkpointing,
# ``src/models/sdxl/denoiser.py:952-959`` analog): the backward recomputes
# each layer's activations instead of storing them — required to fit 1024^2
# training batches in HBM
_apply_layer_remat = nnx.remat(_apply_layer)


def _layer_fn(gradient_checkpointing: bool):
    return _apply_layer_remat if gradient_checkpointing else _apply_layer


class DownBlocks(nnx.Module):
    """Flattened input_blocks (reference ``denoiser.py:613-773``)."""

    def __init__(self, in_channels, block_out_channels, down_blocks,
                 num_transformers_per_block, layers_per_block, time_embed_dim,
                 dropout, conv_resample, num_head_channels, context_dim,
                 transformer_block_class=TransformerBlock,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        blocks: list = []
        current = in_channels
        for i, (block, out_channels, num_transformers) in enumerate(
            zip(down_blocks, block_out_channels, num_transformers_per_block)
        ):
            if block == "DownBlock2D":
                blocks.append(
                    nnx.List([_conv(in_channels, block_out_channels[0], 3,
                                    padding=1, **kw)])
                )
                current = out_channels
                for _ in range(layers_per_block):
                    blocks.append(
                        nnx.List([ResidualBlock(
                            current, time_embed_dim, dropout,
                            out_channels=out_channels, **kw)])
                    )
            elif block == "TransformerDownBlock2D":
                for _ in range(layers_per_block):
                    layer_list = [
                        ResidualBlock(current, time_embed_dim, dropout,
                                      out_channels=out_channels, **kw)
                    ]
                    current = out_channels
                    layer_list.append(
                        SpatialTransformer(
                            in_channels=out_channels,
                            num_heads=out_channels // num_head_channels,
                            head_dim=num_head_channels,
                            context_dims=[context_dim] * num_transformers,
                            transformer_block_class=transformer_block_class,
                            **kw,
                        )
                    )
                    blocks.append(nnx.List(layer_list))
            else:
                raise ValueError(f"Invalid block: {block}")
            if i != len(down_blocks) - 1:
                blocks.append(
                    nnx.List([Downsample(out_channels, out_channels,
                                         use_resample=conv_resample, **kw)])
                )
        self.blocks = nnx.List(blocks)
        self.gradient_checkpointing = False

    def __call__(self, hidden_states, context, global_embedding,
                 time_embedding, transformer_args=None,
                 cross_attention_kwargs=None) -> DownBlocksOutput:
        skips: list[jax.Array] = []
        apply = _layer_fn(self.gradient_checkpointing)
        for layer_list in self.blocks:
            for layer in layer_list:
                hidden_states = apply(
                    layer, hidden_states, context, global_embedding,
                    time_embedding, transformer_args, cross_attention_kwargs,
                )
            skips.append(hidden_states)
        return DownBlocksOutput(hidden_states, skips)


class MidBlock(nnx.Module):
    """Res -> Transformer -> Res (reference ``denoiser.py:776-857``)."""

    def __init__(self, hidden_dim, time_embed_dim, mid_block_type,
                 num_transformers, dropout, num_head_channels, context_dim,
                 transformer_block_class=TransformerBlock,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        blocks = [
            ResidualBlock(hidden_dim, time_embed_dim, dropout,
                          out_channels=hidden_dim, **kw)
        ]
        if mid_block_type == "TransformerMidBlock2D":
            blocks.append(
                SpatialTransformer(
                    in_channels=hidden_dim,
                    num_heads=hidden_dim // num_head_channels,
                    head_dim=num_head_channels,
                    context_dims=[context_dim] * num_transformers,
                    transformer_block_class=transformer_block_class,
                    **kw,
                )
            )
        blocks.append(
            ResidualBlock(hidden_dim, time_embed_dim, dropout,
                          out_channels=hidden_dim, **kw)
        )
        self.blocks = nnx.List(blocks)
        self.gradient_checkpointing = False

    def __call__(self, hidden_states, context, global_embedding,
                 time_embedding, transformer_args=None,
                 cross_attention_kwargs=None) -> jax.Array:
        apply = _layer_fn(self.gradient_checkpointing)
        for layer in self.blocks:
            hidden_states = apply(
                layer, hidden_states, context, global_embedding,
                time_embedding, transformer_args, cross_attention_kwargs,
            )
        return hidden_states


class UpBlocks(nnx.Module):
    """Flattened output_blocks with concat skips (reference
    ``denoiser.py:860-1005``); each non-final stage's Upsample is appended to
    that stage's LAST layer-list (matching reference key layout)."""

    def __init__(self, in_channels, block_out_channels, down_skip_channels,
                 up_blocks, num_transformers_per_block, layers_per_block,
                 time_embed_dim, dropout, conv_resample, num_head_channels,
                 context_dim, transformer_block_class=TransformerBlock,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        down_skip_channels = list(down_skip_channels)
        blocks: list = []
        current = in_channels
        for i, (block, out_channels, num_transformers) in enumerate(
            zip(up_blocks, block_out_channels, num_transformers_per_block)
        ):
            stage_lists: list[list] = []
            if block == "UpBlock2D":
                for _ in range(layers_per_block):
                    stage_lists.append([
                        ResidualBlock(
                            current + down_skip_channels.pop(), time_embed_dim,
                            dropout, out_channels=out_channels, **kw)
                    ])
                    current = out_channels
            elif block == "TransformerUpBlock2D":
                for _ in range(layers_per_block):
                    layer_list = [
                        ResidualBlock(
                            current + down_skip_channels.pop(), time_embed_dim,
                            dropout, out_channels=out_channels, **kw)
                    ]
                    current = out_channels
                    layer_list.append(
                        SpatialTransformer(
                            in_channels=out_channels,
                            num_heads=out_channels // num_head_channels,
                            head_dim=num_head_channels,
                            context_dims=[context_dim] * num_transformers,
                            transformer_block_class=transformer_block_class,
                            **kw,
                        )
                    )
                    stage_lists.append(layer_list)
            else:
                raise ValueError(f"Invalid block: {block}")
            if i != len(up_blocks) - 1:
                stage_lists[-1].append(
                    Upsample(out_channels, out_channels,
                             use_resample=conv_resample, **kw)
                )
            blocks.extend(nnx.List(ls) for ls in stage_lists)
        self.blocks = nnx.List(blocks)
        self.gradient_checkpointing = False

    def __call__(self, hidden_states, context, global_embedding,
                 time_embedding, skip_connections, transformer_args=None,
                 cross_attention_kwargs=None) -> jax.Array:
        skip_connections = list(skip_connections)
        apply = _layer_fn(self.gradient_checkpointing)
        for layer_list in self.blocks:
            skip = skip_connections.pop()
            hidden_states = jnp.concatenate([hidden_states, skip], axis=-1)
            for layer in layer_list:
                hidden_states = apply(
                    layer, hidden_states, context, global_embedding,
                    time_embedding, transformer_args, cross_attention_kwargs,
                )
        return hidden_states


# -------------------------------------------------------------- UNet


class UNet(nnx.Module):
    """Reference ``denoiser.py:1007-1236``."""

    transformer_block_class = TransformerBlock

    def __init__(self, config: DenoiserConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        cfg = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        hidden_dim = cfg.hidden_dim
        time_embed_dim = hidden_dim * 4
        self.hidden_dim = hidden_dim
        self.time_embed_dim = time_embed_dim
        self.additional_cond_dim = cfg.additional_condition_dim

        self.time_embed = MLPEmbedder(hidden_dim, time_embed_dim, **kw)
        self.label_emb = MLPEmbedder(cfg.global_cond_dim, time_embed_dim, **kw)

        self.input_blocks = DownBlocks(
            in_channels=cfg.in_channels,
            block_out_channels=cfg.block_out_channels,
            down_blocks=cfg.down_blocks,
            num_transformers_per_block=cfg.num_transformers_per_block,
            layers_per_block=cfg.layers_per_block,
            time_embed_dim=time_embed_dim,
            dropout=0.0,
            conv_resample=cfg.conv_resample,
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_block_class=self.transformer_block_class,
            **kw,
        )
        self.middle_block = MidBlock(
            hidden_dim=cfg.block_out_channels[-1],
            time_embed_dim=time_embed_dim,
            mid_block_type=cfg.mid_block,
            num_transformers=cfg.num_transformers_per_block[-1],
            dropout=0.0,
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_block_class=self.transformer_block_class,
            **kw,
        )

        down_skip_channels = []
        for i, (block, channels) in enumerate(
            zip(cfg.down_blocks, cfg.block_out_channels)
        ):
            if block == "DownBlock2D":
                down_skip_channels.extend([channels] * (cfg.layers_per_block + 1))
            elif block == "TransformerDownBlock2D":
                down_skip_channels.extend([channels] * cfg.layers_per_block)
            if i != len(cfg.down_blocks) - 1:
                down_skip_channels.append(channels)

        self.output_blocks = UpBlocks(
            in_channels=cfg.block_out_channels[-1],
            block_out_channels=cfg.block_out_channels[::-1],
            down_skip_channels=down_skip_channels,
            up_blocks=cfg.up_blocks,
            num_transformers_per_block=cfg.num_transformers_per_block[::-1],
            layers_per_block=cfg.layers_per_block + 1,
            time_embed_dim=time_embed_dim,
            dropout=0.0,
            conv_resample=cfg.conv_resample,
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_block_class=self.transformer_block_class,
            **kw,
        )
        self.out_norm = nnx.GroupNorm(
            num_features=hidden_dim, num_groups=32, epsilon=1e-5,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs,
        )
        self.out_conv = _conv(hidden_dim, cfg.out_channels, 3, padding=1, **kw)

    def get_timestep_embedding(self, timestep: jax.Array, dim: int) -> jax.Array:
        return get_timestep_embedding(
            timestep, embedding_dim=dim, flip_sin_to_cos=True,
            downscale_freq_shift=0.0,
        )

    def prepare_global_condition(self, timestep, text_pooler_output,
                                 original_size, target_size, crop_coords,
                                 dtype) -> tuple[jax.Array, jax.Array]:
        """time MLP + (pooled, 6x256 size sincos) MLP
        (reference ``denoiser.py:1125-1178``)."""
        time_embed = self.get_timestep_embedding(timestep, self.hidden_dim)
        time_embed = self.time_embed(time_embed.astype(dtype))

        batch = text_pooler_output.shape[0]
        # batched sincos (no reshape(-1): flattening batch into the element
        # axis forces an SPMD full remat when the batch axis is mesh-sharded)
        additional = jnp.concatenate(
            [original_size, crop_coords, target_size], axis=1
        )  # (B, 6)
        additional = self.get_timestep_embedding(
            additional, self.additional_cond_dim
        ).reshape(batch, -1)
        global_cond = jnp.concatenate(
            [text_pooler_output, additional.astype(text_pooler_output.dtype)],
            axis=1,
        ).astype(dtype)
        global_cond = self.label_emb(global_cond) + time_embed
        return time_embed, global_cond

    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, 4) NHWC
        timestep: jax.Array,  # (B,)
        encoder_hidden_states: jax.Array,  # (B, 77*N, 2048)
        encoder_pooler_output: jax.Array,  # (B, 1280)
        original_size: jax.Array,  # (B, 2)
        target_size: jax.Array,  # (B, 2)
        crop_coords_top_left: jax.Array,  # (B, 2)
        cross_attention_kwargs: dict | None = None,
    ) -> jax.Array:
        time_embed, global_cond = self.prepare_global_condition(
            timestep, encoder_pooler_output, original_size, target_size,
            crop_coords_top_left, latents.dtype,
        )
        h, skips = self.input_blocks(
            latents, context=encoder_hidden_states,
            global_embedding=global_cond, time_embedding=time_embed,
            cross_attention_kwargs=cross_attention_kwargs,
        )
        h = self.middle_block(
            h, context=encoder_hidden_states, global_embedding=global_cond,
            time_embedding=time_embed,
            cross_attention_kwargs=cross_attention_kwargs,
        )
        h = self.output_blocks(
            h, context=encoder_hidden_states, global_embedding=global_cond,
            time_embedding=time_embed, skip_connections=skips,
            cross_attention_kwargs=cross_attention_kwargs,
        )
        return self.out_conv(jax.nn.silu(self.out_norm(h)))

    def set_gradient_checkpointing(self, enable: bool):
        self.gradient_checkpointing = enable
        self.input_blocks.gradient_checkpointing = enable
        self.middle_block.gradient_checkpointing = enable
        self.output_blocks.gradient_checkpointing = enable


class Denoiser(UNet):
    """Config-driven alias (reference ``denoiser.py:1239-1267``)."""
