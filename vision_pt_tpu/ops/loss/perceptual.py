"""Perceptual losses (rebuild of reference ``src/modules/loss/perceptual.py``).

The reference wraps torchmetrics LPIPS/SSIM (CUDA). Here both are native JAX:
SSIM is pure math; LPIPS is a VGG16 feature net + learned 1x1 heads that
loads pretrained weights from a local path (torchvision vgg16 .pth, lpips /
torchmetrics state dicts, or safetensors) — no egress in this environment.
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


# ---------------------------------------------------------------- LPIPS
#
# Learned Perceptual Image Patch Similarity over VGG16 features (the math of
# the lpips package that torchmetrics wraps, reference ``perceptual.py:37-86``):
# capture relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalize,
# squared diff, learned 1x1 "lin" head per stage, spatial mean, sum stages.

# per-stage conv channel plans of torchvision VGG16 `features`
_VGG16_STAGES = [
    [(3, 64), (64, 64)],
    [(64, 128), (128, 128)],
    [(128, 256), (256, 256), (256, 256)],
    [(256, 512), (512, 512), (512, 512)],
    [(512, 512), (512, 512), (512, 512)],
]
# torchvision `features.{idx}` conv indices, grouped per stage
_VGG16_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
# lpips input scaling layer constants (lpips/pretrained_networks ScalingLayer)
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


def _torch_conv_to_nhwc(w) -> jnp.ndarray:
    """(out, in, kh, kw) torch conv weight -> (kh, kw, in, out) HWIO."""
    import numpy as np

    w = np.asarray(w, dtype=np.float32)
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def load_lpips_weights(weights_path: str) -> dict:
    """Load LPIPS-VGG params from a local torch/safetensors checkpoint.

    Accepted layouts (auto-detected by key pattern):
    - torchmetrics / lpips package: ``net.slice{k}.{idx}.weight`` VGG convs +
      ``lin{k}.model.1.weight`` (or ``lins.{k}.model.1.weight``) heads
    - torchvision VGG16: ``features.{idx}.weight`` (+ optional separate
      ``lin{k}.weight`` heads; absent heads default to uniform 1/C, which is
      the unlearned-LPIPS baseline)
    """
    import numpy as np

    if weights_path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(weights_path)
    else:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}

    def get(*names):
        for n in names:
            if n in sd:
                return sd[n]
        return None

    convs, lins = [], []
    for k, (stage, idxs) in enumerate(zip(_VGG16_STAGES, _VGG16_CONV_IDX)):
        stage_convs = []
        for j, idx in enumerate(idxs):
            # slice-local index: convs sit at even offsets inside each slice;
            # slice boundaries are at the torchvision feature indices
            slice_start = [0, 4, 9, 16, 23][k]
            w = get(
                f"net.slice{k + 1}.{idx}.weight",
                f"net.net.slice{k + 1}.{idx}.weight",
                f"features.{idx}.weight",
                f"slice{k + 1}.{idx - slice_start}.weight",
            )
            b = get(
                f"net.slice{k + 1}.{idx}.bias",
                f"net.net.slice{k + 1}.{idx}.bias",
                f"features.{idx}.bias",
                f"slice{k + 1}.{idx - slice_start}.bias",
            )
            if w is None:
                raise ValueError(
                    f"LPIPS weights at {weights_path} missing VGG conv "
                    f"stage {k + 1} (features.{idx})"
                )
            stage_convs.append(
                (
                    _torch_conv_to_nhwc(w),
                    jnp.asarray(np.asarray(b, dtype=np.float32))
                    if b is not None
                    else jnp.zeros(stage[j][1], dtype=jnp.float32),
                )
            )
        convs.append(stage_convs)

        lin = get(
            f"lin{k}.model.1.weight",
            f"lins.{k}.model.1.weight",
            f"lin{k}.weight",
        )
        channels = stage[-1][1]
        if lin is None:
            lins.append(jnp.full((channels,), 1.0 / channels, dtype=jnp.float32))
        else:
            lin = np.asarray(lin, dtype=np.float32).reshape(-1)  # (C,) 1x1 conv
            lins.append(jnp.asarray(lin))
    return {"convs": convs, "lins": lins}


def _vgg16_stage(x, stage_convs):
    for kernel, bias in stage_convs:
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        x = jax.nn.relu(x)
    return x


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _unit_normalize(x, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_from_params(
    params: dict,
    x: jax.Array,  # (B, H, W, 3) NHWC in [0, 1]
    y: jax.Array,
) -> jax.Array:
    """LPIPS distance per batch element. Differentiable, jit-friendly."""
    shift = jnp.asarray(_LPIPS_SHIFT, dtype=jnp.float32)
    scale = jnp.asarray(_LPIPS_SCALE, dtype=jnp.float32)

    def prep(img):
        img = img.astype(jnp.float32) * 2.0 - 1.0  # lpips normalize=True
        return (img - shift) / scale

    fx, fy = prep(x), prep(y)
    total = jnp.zeros(x.shape[0], dtype=jnp.float32)
    for k, (stage_convs, lin) in enumerate(zip(params["convs"], params["lins"])):
        if k > 0:
            fx, fy = _maxpool2(fx), _maxpool2(fy)
        fx = _vgg16_stage(fx, stage_convs)
        fy = _vgg16_stage(fy, stage_convs)
        diff = jnp.square(_unit_normalize(fx) - _unit_normalize(fy))
        total = total + jnp.mean(diff @ lin, axis=(1, 2))
    return total


class LPIPS:
    """LPIPS with local pretrained weights (no egress in this environment —
    the reference's torchmetrics download is replaced by ``weights_path``).

    Inputs are NHWC in [0, 1] (matching the reference's ``normalize=True``
    torchmetrics configuration, ``perceptual.py:52-57``).
    """

    def __init__(self, weights_path: str | None = None, params: dict | None = None):
        if params is not None:
            self.params = params
        elif weights_path is not None:
            self.params = load_lpips_weights(weights_path)
        else:
            raise ValueError(
                "LPIPS needs pretrained VGG weights on local disk: pass "
                "weights_path (torchvision vgg16 .pth, lpips/torchmetrics "
                "state dict, or a safetensors export). SSIM is available "
                "natively without weights."
            )

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return lpips_from_params(self.params, x, y)


class PerceptualLoss:
    """Weighted multi-metric perceptual loss (reference
    ``perceptual.py:37-86``): returns a dict of named losses plus 'total'."""

    def __init__(self, losses: dict[PerceptualLossType, float] | None = None,
                 data_range: float = 2.0,
                 lpips_weights_path: str | None = None,
                 convert_zero_to_one: bool = True):
        self.weights = losses or {"ssim": 1.0}
        self.data_range = data_range
        # reference semantics: inputs may be in [-1, 1]; LPIPS runs on [0, 1]
        # (``perceptual.py:68-73``)
        self.convert_zero_to_one = convert_zero_to_one
        self.lpips = (
            LPIPS(lpips_weights_path) if "lpips" in self.weights else None
        )

    def __call__(self, pred: jax.Array, target: jax.Array) -> dict[str, jax.Array]:
        out: dict[str, jax.Array] = {}
        total = 0.0
        for name, weight in self.weights.items():
            if name == "ssim":
                value = ssim_loss(pred, target, data_range=self.data_range)
            elif name == "lpips":
                p, t = pred, target
                if self.convert_zero_to_one:
                    p = (p + 1.0) / 2.0
                    t = (t + 1.0) / 2.0
                p = jnp.clip(p, 0.0, 1.0)
                t = jnp.clip(t, 0.0, 1.0)
                value = jnp.mean(self.lpips(p, t))
            else:
                raise ValueError(f"Unknown perceptual loss: {name}")
            out[name] = value
            total = total + weight * value
        out["total"] = total
        return out
