"""Numerical parity of the JAX LPIPS (ops/loss/perceptual.py) against the
upstream ``lpips`` package formula, computed live in torch with a fixed
random VGG16 (VERDICT r3 #8).

torchmetrics is not installed here (and real VGG weights need egress), so
the oracle is a from-scratch torch implementation that mirrors the lpips
package structure exactly — ScalingLayer constants, torchvision VGG16
feature indices, slice boundaries at 4/9/16/23, normalize_tensor eps
placement, learned 1x1 heads, spatial mean, stage sum (the same math the
reference consumes through torchmetrics, reference
``src/modules/loss/perceptual.py:37-86``). Random weights + random inputs
exercise every term; agreement to ~1e-4 rules out structural divergence
(wrong slice boundary, missing relu, eps placement, head application).
"""

import numpy as np
import pytest

from tests.parity_record import record

# torchvision VGG16 `features` conv indices and maxpool positions
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_IDX = [4, 9, 16, 23]
_SLICE_END = [4, 9, 16, 23, 30]  # lpips slices: features[:4], [4:9], ...
_CHANNELS = {
    0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
_STAGE_OUT = [64, 128, 256, 512, 512]
_SHIFT = [-0.030, -0.088, -0.188]
_SCALE = [0.458, 0.448, 0.450]


def _random_vgg_state(rng) -> dict[str, np.ndarray]:
    sd = {}
    for idx in _CONV_IDX:
        cin, cout = _CHANNELS[idx]
        # small-scale init keeps deep-stage activations in a sane range
        sd[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, size=(cout, cin, 3, 3)
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(0, 0.05, size=(cout,)).astype(
            np.float32
        )
    for k, c in enumerate(_STAGE_OUT):
        sd[f"lin{k}.weight"] = np.abs(
            rng.normal(0, 1.0, size=(1, c, 1, 1))
        ).astype(np.float32)
    return sd


def _torch_lpips(sd: dict[str, np.ndarray], x: np.ndarray, y: np.ndarray):
    """The lpips package forward, written against torch primitives only.

    x/y are NCHW in [0, 1] (normalize=True semantics: scaled to [-1, 1]
    before the ScalingLayer)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def features(t):
        outs = []
        h = t
        next_conv = 0
        for idx in range(_SLICE_END[-1]):
            if idx in _CHANNELS:
                w = torch.from_numpy(sd[f"features.{idx}.weight"])
                b = torch.from_numpy(sd[f"features.{idx}.bias"])
                h = F.conv2d(h, w, b, padding=1)
                next_conv += 1
            elif idx in _POOL_IDX:
                h = F.max_pool2d(h, 2, 2)
            else:  # ReLU positions (every conv is followed by one)
                h = F.relu(h)
            if idx + 1 in _SLICE_END:
                outs.append(h)
        return outs

    def normalize_tensor(t, eps=1e-10):
        norm = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
        return t / (norm + eps)

    with torch.no_grad():
        tx = torch.from_numpy(x) * 2.0 - 1.0
        ty = torch.from_numpy(y) * 2.0 - 1.0
        fx = features((tx - shift) / scale)
        fy = features((ty - shift) / scale)
        total = torch.zeros(x.shape[0])
        for k in range(5):
            d = (normalize_tensor(fx[k]) - normalize_tensor(fy[k])) ** 2
            lin = torch.from_numpy(sd[f"lin{k}.weight"])
            total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total.numpy()


@pytest.mark.slow
def test_lpips_matches_lpips_package_formula(tmp_path):
    import torch  # noqa: F401  (skip cleanly if torch were absent)

    import jax.numpy as jnp

    from vision_pt_tpu.ops.loss.perceptual import LPIPS

    rng = np.random.default_rng(0)
    sd = _random_vgg_state(rng)

    # natural-image-ish inputs in [0, 1]
    size = 64
    x = rng.random((2, 3, size, size)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)

    want = _torch_lpips(sd, x, y)

    from safetensors.numpy import save_file

    path = str(tmp_path / "random_vgg_lpips.safetensors")
    save_file({k: v for k, v in sd.items()}, path)
    lpips = LPIPS(weights_path=path)
    got = np.asarray(
        lpips(jnp.asarray(x.transpose(0, 2, 3, 1)),
              jnp.asarray(y.transpose(0, 2, 3, 1)))
    )

    assert got.shape == want.shape
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
    print(f"LPIPS parity: got={got}, want={want}, max rel err={rel.max():.2e}")
    record("lpips_formula_max_rel_err", float(rel.max()), unit="rel")
    assert rel.max() < 1e-3, (got, want)


@pytest.mark.slow
def test_lpips_identical_inputs_zero():
    import jax.numpy as jnp

    from vision_pt_tpu.ops.loss.perceptual import LPIPS, load_lpips_weights
    from safetensors.numpy import save_file
    import tempfile

    rng = np.random.default_rng(1)
    sd = _random_vgg_state(rng)
    path = tempfile.mktemp(suffix=".safetensors")
    save_file(sd, path)
    lpips = LPIPS(params=load_lpips_weights(path))
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    d = np.asarray(lpips(x, x))
    assert np.allclose(d, 0.0, atol=1e-6)
