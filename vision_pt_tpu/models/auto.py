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

    @staticmethod
    def _sniff_layout(weights_path: str) -> str:
        """'timm' (blocks.N.* ViT keys) vs 'clip' (vision_model.* keys),
        decided from the checkpoint itself — the reference's
        transformers-vs-timm config split (``auto.py:36-95``) collapses to
        a key-layout sniff for local weights."""
        from pathlib import Path

        from safetensors import safe_open

        p = Path(weights_path)
        files = [p] if p.is_file() else sorted(p.glob("*.safetensors"))
        for f in files:
            with safe_open(str(f), framework="np") as sf:
                for k in sf.keys():
                    if k.startswith("blocks."):
                        return "timm"
                    if "vision_model." in k:
                        return "clip"
        return "clip"

    def _load_model(self):
        if self._encode_fn is not None:
            return
        weights_path = getattr(self.config, "weights_path", None)
        if weights_path:
            import os

            if not (os.path.isdir(weights_path) or os.path.isfile(weights_path)):
                raise FileNotFoundError(
                    f"weights_path {weights_path!r} not found (expected a "
                    "safetensors file or an HF-layout directory)"
                )
            feature_type = getattr(self.config, "feature_type",
                                   "pooler_output")
            index = getattr(self.config, "hidden_state_index", -1)
            layout = self._sniff_layout(weights_path)

            if layout == "timm":
                from .timm_vit import TimmViT

                # head count is NOT recoverable from fused-qkv weights; the
                # embed_dim//64 inference is wrong for e.g. ViT-H/14 (16
                # heads of 80) — configs for such towers must set num_heads
                vit = TimmViT.from_local(
                    weights_path,
                    num_heads=getattr(self.config, "num_heads", None),
                )

                def encode(images):
                    out = vit(images)
                    if feature_type == "hidden_state":
                        # reference timm path returns the block's token grid
                        # (auto.py:126-136); drop the cls prefix token
                        h = out.hidden_states[index]
                        return h[:, 1:] if vit.cls_token is not None else h
                    return out.pooler_output

            else:
                from .clip_vision import CLIPVisionModel

                model = CLIPVisionModel.from_local(weights_path)

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
            "has no network egress. Provide weights_path (local safetensors: "
            "CLIP vision towers or timm-layout ViTs) or inject encode_fn."
        )

    def __call__(self, images) -> jax.Array:
        if self._encode_fn is None:
            self._load_model()
        return self._encode_fn(images)
