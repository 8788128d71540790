"""Patchify / unpatchify for ViT-style models.

TPU-native rebuild of the reference's ``src/modules/patch.py``. Images are
**NHWC** here (TPU-preferred layout); the per-patch feature ordering is kept
identical to the reference's NCHW implementation — features are flattened as
``(channels, patch_h, patch_w)`` — so patch-embedding weights converted from
PyTorch checkpoints apply without permutation of the feature axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PatchifyOutput(NamedTuple):
    patches: jax.Array  # (B, num_patches, patch*patch*C)
    grid_height: int  # number of patches vertically
    grid_width: int  # number of patches horizontally


def patchify(image: jax.Array, patch_size: int) -> PatchifyOutput:
    """Split an NHWC image into flattened patches.

    Args:
        image: (B, H, W, C) array. H and W must be divisible by patch_size.
        patch_size: patch edge length.

    Returns:
        PatchifyOutput with patches of shape (B, gh*gw, patch*patch*C) where the
        feature axis is ordered (c, ph, pw) — matching the reference's
        ``src/modules/patch.py:17-60``.
    """
    if image.ndim == 3:
        image = image[None]
    batch, height, width, channels = image.shape
    gh, gw = height // patch_size, width // patch_size
    x = image.reshape(batch, gh, patch_size, gw, patch_size, channels)
    # (B, gh, gw, C, ph, pw) to match reference feature ordering
    x = x.transpose(0, 1, 3, 5, 2, 4)
    patches = x.reshape(batch, gh * gw, channels * patch_size * patch_size)
    return PatchifyOutput(patches=patches, grid_height=gh, grid_width=gw)


def unpatchify(
    patches: jax.Array,
    grid_height: int,
    grid_width: int,
    patch_size: int,
    out_channels: int,
) -> jax.Array:
    """Inverse of :func:`patchify`; returns an NHWC image.

    Matches reference ``src/modules/patch.py:66-115`` (feature axis ordered
    (c, ph, pw)).
    """
    if patches.ndim == 2:
        patches = patches[None]
    batch = patches.shape[0]
    x = patches.reshape(
        batch, grid_height, grid_width, out_channels, patch_size, patch_size
    )
    # (B, gh, ph, gw, pw, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(
        batch, grid_height * patch_size, grid_width * patch_size, out_channels
    )


def pixel_shuffle_nhwc(x: jax.Array, upscale: int) -> jax.Array:
    """NHWC pixel shuffle: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Channel semantics match ``torch.nn.functional.pixel_shuffle`` on NCHW:
    input channel index c*r*r + i*r + j maps to output channel c at spatial
    offset (i, j). Used by JiT's unpatchify variant
    (reference ``src/models/jit/denoiser.py:828-912``).
    """
    batch, height, width, channels = x.shape
    out_c = channels // (upscale * upscale)
    x = x.reshape(batch, height, width, out_c, upscale, upscale)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(batch, height * upscale, width * upscale, out_c)
