"""Auto image encoder (rebuild of reference ``src/models/auto.py:98-148``).

The reference wraps timm/transformers vision towers with pretrained weights.
This environment has no network egress, so construction requires either a
local weights path or an injected encode function; tests inject fakes.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


class AutoImageEncoder:
    """Pluggable image-feature extractor: images (B, H, W, 3) in [-1, 1] ->
    pooled features (B, feature_dim)."""

    def __init__(self, config, encode_fn: Callable | None = None):
        self.config = config
        self._encode_fn = encode_fn

    def set_encode_fn(self, fn: Callable):
        self._encode_fn = fn

    def _load_model(self):
        if self._encode_fn is not None:
            return
        if getattr(self.config, "weights_path", None):
            raise NotImplementedError(
                "local vision-tower loading is tracked for a later round"
            )
        raise RuntimeError(
            "AutoImageEncoder needs pretrained vision weights "
            f"({getattr(self.config, 'model_name', '?')}); this environment "
            "has no network egress. Provide weights_path or inject encode_fn."
        )

    def __call__(self, images) -> jax.Array:
        if self._encode_fn is None:
            self._load_model()
        return self._encode_fn(images)
