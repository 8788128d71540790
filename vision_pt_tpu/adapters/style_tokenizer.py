"""Style tokenizer adapter: a vision tower projects a reference image into
the embeddings of N ``<|style|>`` placeholder tokens, one projector per CLIP
text encoder.

Rebuild of the surface used by reference
``src/models/sdxl/adapter/style_tokenizer.py`` (whose support module
``src/modules/adapter/style_tokenizer.py`` is absent upstream —
StyleTokenizerConfig / StyleTokenizerManager rebuilt from usage).
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import numpy as np
from flax import nnx
from pydantic import BaseModel

from .ip_adapter import ImageEncoderConfig, retype_to_adapter_params
from .prompt_free import LinearProjector, MLPProjector, Resampler


class StyleProjectionOutput(NamedTuple):
    style_tokens: jax.Array  # (B, num_style_tokens, text_hidden_dim)


class StyleTokenizerConfig(BaseModel):
    image_encoder: ImageEncoderConfig = ImageEncoderConfig()
    checkpoint_weight: str | None = None

    style_token: str = "<|style|>"
    num_style_tokens: int = 4
    projector_type: Literal["linear", "mlp", "resampler"] = "linear"
    projector_args: dict = {}

    image_size: int = 448
    background_color: int = 255
    image_mean: list[float] = [0.5, 0.5, 0.5]
    image_std: list[float] = [0.5, 0.5, 0.5]


_PROJECTORS = {
    "linear": LinearProjector,
    "mlp": MLPProjector,
    "resampler": Resampler,
}


class StyleProjector(nnx.Module):
    """Wraps a PFG-style projector, renaming the output field."""

    def __init__(self, inner: nnx.Module):
        self.inner = inner

    def __call__(self, features: jax.Array) -> StyleProjectionOutput:
        out = self.inner(features)
        return StyleProjectionOutput(style_tokens=out.image_tokens)


class StyleTokenizerManager:
    """Projector factory + adapter IO; no UNet surgery (the style tokens
    enter through the text encoders)."""

    def __init__(self, adapter_config: StyleTokenizerConfig):
        self.adapter_config = adapter_config
        self.projectors: list[StyleProjector] = []

    def get_projector(self, out_features: int, *,
                      rngs: nnx.Rngs | None = None) -> StyleProjector:
        rngs = rngs or nnx.Rngs(len(self.projectors))
        cfg = self.adapter_config
        cls = _PROJECTORS[cfg.projector_type]
        proj = StyleProjector(cls(
            feature_dim=cfg.image_encoder.feature_dim,
            out_features=out_features,
            num_tokens=cfg.num_style_tokens,
            **cfg.projector_args,
            rngs=rngs,
        ))
        self.projectors.append(proj)
        return proj

    def apply_adapter(self, model, *, rngs=None) -> list[str]:
        return []

    def set_adapter_trainable(self, trainable: bool = True) -> None:
        if trainable:
            for proj in self.projectors:
                retype_to_adapter_params(proj)

    # --------------------------------------------------------------- io

    def get_state_dict(self) -> dict[str, np.ndarray]:
        from ..models.sdxl.convert import unet_nnx_to_torch
        from ..utils.state_dict import flatten_state

        out = {}
        for i, proj in enumerate(self.projectors, start=1):
            flat = {k: np.asarray(v)
                    for k, v in flatten_state(proj).items()}
            out |= {
                f"projector_{i}.{k}": v
                for k, v in unet_nnx_to_torch(flat).items()
            }
        return out

    def load_adapter_state(self, sd: dict[str, np.ndarray]) -> None:
        from ..models.sdxl.convert import unet_torch_to_nnx
        from ..utils.state_dict import load_flat_state

        for i, proj in enumerate(self.projectors, start=1):
            prefix = f"projector_{i}."
            sub = {
                k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)
            }
            if sub:
                load_flat_state(proj, unet_torch_to_nnx(sub), strict=False)
