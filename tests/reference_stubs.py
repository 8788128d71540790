"""Make the PyTorch reference at /root/reference importable on CPU by
stubbing its CUDA-only dependencies. Used by parity tests."""

import importlib.machinery
import os
import sys
from unittest.mock import MagicMock

REFERENCE = "/root/reference"

_STUBBED = [
    "bitsandbytes", "bitsandbytes.nn", "bitsandbytes.functional",
    "torchao", "torchao.dtypes", "torchao.dtypes.nf4tensor", "torchao.float8",
    "optimum", "optimum.quanto", "flash_attn", "xformers", "xformers.ops",
    "diffusers", "diffusers.models", "diffusers.models.autoencoders",
    "diffusers.models.autoencoders.autoencoder_kl", "diffusers.image_processor",
    "torchmetrics", "torchmetrics.image", "torchmetrics.image.lpip",
    "litserve", "schedulefree", "imagesize", "polars", "wandb", "cv2",
    "cheesechaser", "gradio",
]


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "src"))


def install_stubs() -> None:
    for name in _STUBBED:
        if name in sys.modules:
            continue
        mod = MagicMock()
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
