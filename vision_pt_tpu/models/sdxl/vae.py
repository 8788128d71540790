"""SDXL KL VAE, TPU-native (rebuild of reference ``src/models/sdxl/vae.py``,
which subclasses diffusers AutoencoderKL with the SDXL config inline).

NHWC throughout; module paths mirror diffusers key names
(``encoder.down_blocks.N.resnets.M...``) so original/diffusers checkpoints
load through the converters, including the reference's 4D<->2D attention
projection fixups (``vae.py:52-85``). Supports tiled decode for large images
(reference ``src/models/sdxl/pipeline.py:207-226``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

VAE_COMPRESSION_RATIO = 8
VAE_SCALING_FACTOR = 0.13025
VAE_SHIFT_FACTOR = 0.0

DEFAULT_VAE_CONFIG = dict(
    block_out_channels=(128, 256, 512, 512),
    in_channels=3,
    latent_channels=4,
    layers_per_block=2,
    norm_num_groups=32,
    out_channels=3,
    scaling_factor=VAE_SCALING_FACTOR,
)


def _conv(cin, cout, k, stride=1, padding=1, *, dtype, param_dtype, rngs):
    return nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                    padding=padding, dtype=dtype, param_dtype=param_dtype,
                    rngs=rngs)


class ResnetBlock(nnx.Module):
    """diffusers ResnetBlock2D (VAE flavor, no time embedding)."""

    def __init__(self, cin, cout, groups=32, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(num_features=cin, num_groups=groups,
                                   epsilon=1e-6, param_dtype=param_dtype,
                                   dtype=dtype, rngs=rngs)
        self.conv1 = _conv(cin, cout, 3, padding=1, **kw)
        self.norm2 = nnx.GroupNorm(num_features=cout, num_groups=groups,
                                   epsilon=1e-6, param_dtype=param_dtype,
                                   dtype=dtype, rngs=rngs)
        self.conv2 = _conv(cout, cout, 3, padding=1, **kw)
        self.conv_shortcut = (
            _conv(cin, cout, 1, padding=0, **kw) if cin != cout else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEAttention(nnx.Module):
    """Single-head spatial self-attention at the bottleneck (diffusers
    Attention with residual_connection=True)."""

    def __init__(self, channels, groups=32, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.group_norm = nnx.GroupNorm(num_features=channels,
                                        num_groups=groups, epsilon=1e-6,
                                        param_dtype=param_dtype, dtype=dtype,
                                        rngs=rngs)
        self.to_q = nnx.Linear(channels, channels, **kw)
        self.to_k = nnx.Linear(channels, channels, **kw)
        self.to_v = nnx.Linear(channels, channels, **kw)
        self.to_out = nnx.Linear(channels, channels, **kw)
        self.scale = channels**-0.5

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        tokens = self.group_norm(x).reshape(b, h * w, c)
        q = self.to_q(tokens)
        k = self.to_k(tokens)
        v = self.to_v(tokens)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", weights, v)
        out = self.to_out(out).reshape(b, h, w, c)
        return out + residual


class DownEncoderBlock(nnx.Module):
    def __init__(self, cin, cout, layers, has_downsample, groups, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        resnets = []
        for i in range(layers):
            resnets.append(ResnetBlock(cin if i == 0 else cout, cout,
                                       groups, **kw))
        self.resnets = nnx.List(resnets)
        # diffusers VAE downsampler: stride-2 conv with asymmetric (0,1) pad
        self.downsampler = (
            nnx.Conv(cout, cout, kernel_size=(3, 3), strides=(2, 2),
                     padding=((0, 1), (0, 1)), dtype=dtype,
                     param_dtype=param_dtype, rngs=rngs)
            if has_downsample else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsampler is not None:
            x = self.downsampler(x)
        return x


class UpDecoderBlock(nnx.Module):
    def __init__(self, cin, cout, layers, has_upsample, groups, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        resnets = []
        for i in range(layers):
            resnets.append(ResnetBlock(cin if i == 0 else cout, cout,
                                       groups, **kw))
        self.resnets = nnx.List(resnets)
        self.upsampler = (
            _conv(cout, cout, 3, padding=1, **kw) if has_upsample else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsampler is not None:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = self.upsampler(x)
        return x


class MidBlock(nnx.Module):
    def __init__(self, channels, groups, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock(channels, channels, groups, **kw),
            ResnetBlock(channels, channels, groups, **kw),
        ])
        self.attentions = nnx.List([VAEAttention(channels, groups, **kw)])

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nnx.Module):
    def __init__(self, in_channels, block_out_channels, layers_per_block,
                 latent_channels, groups, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv_in = _conv(in_channels, block_out_channels[0], 3, padding=1, **kw)
        blocks = []
        cin = block_out_channels[0]
        for i, cout in enumerate(block_out_channels):
            blocks.append(DownEncoderBlock(
                cin, cout, layers_per_block,
                has_downsample=(i != len(block_out_channels) - 1),
                groups=groups, **kw,
            ))
            cin = cout
        self.down_blocks = nnx.List(blocks)
        self.mid_block = MidBlock(block_out_channels[-1], groups, **kw)
        self.conv_norm_out = nnx.GroupNorm(
            num_features=block_out_channels[-1], num_groups=groups,
            epsilon=1e-6, param_dtype=param_dtype, dtype=dtype, rngs=rngs)
        self.conv_out = _conv(block_out_channels[-1], 2 * latent_channels, 3,
                              padding=1, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


class Decoder(nnx.Module):
    def __init__(self, out_channels, block_out_channels, layers_per_block,
                 latent_channels, groups, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        reversed_channels = list(reversed(block_out_channels))
        self.conv_in = _conv(latent_channels, reversed_channels[0], 3,
                             padding=1, **kw)
        self.mid_block = MidBlock(reversed_channels[0], groups, **kw)
        blocks = []
        cin = reversed_channels[0]
        for i, cout in enumerate(reversed_channels):
            blocks.append(UpDecoderBlock(
                cin, cout, layers_per_block + 1,
                has_upsample=(i != len(reversed_channels) - 1),
                groups=groups, **kw,
            ))
            cin = cout
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = nnx.GroupNorm(
            num_features=reversed_channels[-1], num_groups=groups,
            epsilon=1e-6, param_dtype=param_dtype, dtype=dtype, rngs=rngs)
        self.conv_out = _conv(reversed_channels[-1], out_channels, 3,
                              padding=1, **kw)

    def __call__(self, z: jax.Array) -> jax.Array:
        x = self.conv_in(z)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype
        )

    @property
    def mode(self) -> jax.Array:
        return self.mean


class VAE(nnx.Module):
    """AutoencoderKL (SDXL config; scaling 0.13025)."""

    compression_ratio = VAE_COMPRESSION_RATIO
    scaling_factor = VAE_SCALING_FACTOR
    shift_factor = VAE_SHIFT_FACTOR

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 in_channels=3, out_channels=3, latent_channels=4,
                 layers_per_block=2, norm_num_groups=32,
                 scaling_factor=VAE_SCALING_FACTOR, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs, **_unused):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.scaling_factor = scaling_factor
        self.latent_channels = latent_channels
        self.compression_ratio = 2 ** (len(block_out_channels) - 1)
        self.encoder = Encoder(in_channels, block_out_channels,
                               layers_per_block, latent_channels,
                               norm_num_groups, **kw)
        self.decoder = Decoder(out_channels, block_out_channels,
                               layers_per_block, latent_channels,
                               norm_num_groups, **kw)
        self.quant_conv = _conv(2 * latent_channels, 2 * latent_channels, 1,
                                padding=0, **kw)
        self.post_quant_conv = _conv(latent_channels, latent_channels, 1,
                                     padding=0, **kw)

    @classmethod
    def from_default(cls, *, rngs: nnx.Rngs | None = None, **kw) -> "VAE":
        return cls(**DEFAULT_VAE_CONFIG, rngs=rngs or nnx.Rngs(0), **kw)

    def encode(self, images: jax.Array) -> DiagonalGaussian:
        """NHWC [-1,1] images -> latent distribution (pre-scaling)."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, latents: jax.Array) -> jax.Array:
        """Latents (pre-scaling, i.e. already divided by scaling factor) ->
        NHWC images."""
        return self.decoder(self.post_quant_conv(latents))

    def tiled_decode(self, latents: jax.Array, tile_latent_size: int = 128,
                     overlap: float = 0.25) -> jax.Array:
        """Tile-and-blend decode for large images (the reference enables VAE
        tiling >= 1536px, ``pipeline.py:319``)."""
        b, h, w, c = latents.shape
        if h <= tile_latent_size and w <= tile_latent_size:
            return self.decode(latents)
        stride = int(tile_latent_size * (1 - overlap))
        blend = tile_latent_size - stride
        r = self.compression_ratio
        rows = []
        for i in range(0, h, stride):
            row = []
            for j in range(0, w, stride):
                tile = latents[:, i : i + tile_latent_size, j : j + tile_latent_size]
                row.append(self.decode(tile))
            rows.append(row)

        def blend_v(a, bb, extent):
            for y in range(extent):
                alpha = y / extent
                bb = bb.at[:, y].set(a[:, a.shape[1] - extent + y] * (1 - alpha)
                                     + bb[:, y] * alpha)
            return bb

        def blend_h(a, bb, extent):
            for x in range(extent):
                alpha = x / extent
                bb = bb.at[:, :, x].set(
                    a[:, :, a.shape[2] - extent + x] * (1 - alpha)
                    + bb[:, :, x] * alpha)
            return bb

        blend_px = blend * r
        stride_px = stride * r
        out_rows = []
        for i, row in enumerate(rows):
            blended_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = blend_v(rows[i - 1][j], tile, blend_px)
                if j > 0:
                    tile = blend_h(row[j - 1], tile, blend_px)
                blended_row.append(tile[:, :stride_px, :stride_px])
            out_rows.append(jnp.concatenate(blended_row, axis=2))
        return jnp.concatenate(out_rows, axis=1)[:, : h * r, : w * r]
