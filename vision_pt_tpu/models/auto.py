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
        weights_path = getattr(self.config, "weights_path", None)
        if weights_path:
            import os

            if not os.path.isdir(weights_path):
                raise FileNotFoundError(
                    f"weights_path {weights_path!r} is not a directory "
                    "(expected HF layout: config.json + *.safetensors)"
                )
            from .clip_vision import CLIPVisionModel

            model = CLIPVisionModel.from_local(weights_path)
            feature_type = getattr(self.config, "feature_type",
                                   "pooler_output")
            index = getattr(self.config, "hidden_state_index", -1)

            def encode(images):
                out = model(images)
                if feature_type == "hidden_state":
                    return out.hidden_states[index]
                return out.pooler_output

            self._encode_fn = encode
            return
        raise RuntimeError(
            "AutoImageEncoder needs pretrained vision weights "
            f"({getattr(self.config, 'model_name', '?')}); this environment "
            "has no network egress. Provide weights_path (local HF dir, CLIP "
            "vision towers supported) or inject encode_fn."
        )

    def __call__(self, images) -> jax.Array:
        if self._encode_fn is None:
            self._load_model()
        return self._encode_fn(images)
