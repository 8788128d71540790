"""PFG (Prompt-Free Generation) adapter: project vision-tower features into
pseudo text tokens appended to the context sequence.

The reference wires this in ``src/models/sdxl/adapter/prompt_free.py`` via a
``src/modules/adapter/prompt_free.py`` module that is absent upstream (the
import would fail); this is a working rebuild of that surface — PFGConfig /
PFGManager / ProjectionOutput with linear, MLP and perceiver-resampler
projectors. Unlike IP-Adapter there is no UNet surgery: the image tokens ride
the regular cross-attention context (reference
``train/sdxl/prompt_free.self.py:185-192``).
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from pydantic import BaseModel

from .ip_adapter import ImageEncoderConfig, retype_to_adapter_params


class ProjectionOutput(NamedTuple):
    image_tokens: jax.Array  # (B, num_image_tokens, context_dim)


class PFGConfig(BaseModel):
    image_encoder: ImageEncoderConfig = ImageEncoderConfig()
    checkpoint_weight: str | None = None

    num_image_tokens: int = 10
    projector_type: Literal["linear", "mlp", "resampler"] = "linear"
    projector_args: dict = {}

    image_size: int = 448
    background_color: int = 255
    color_channel: Literal["rgb", "bgr"] = "rgb"
    image_mean: list[float] = [0.5, 0.5, 0.5]
    image_std: list[float] = [0.5, 0.5, 0.5]


class LinearProjector(nnx.Module):
    """(B, D) pooled features -> N context tokens via one matmul."""

    def __init__(self, feature_dim: int, out_features: int, num_tokens: int,
                 *, rngs: nnx.Rngs):
        self.num_tokens = num_tokens
        self.out_features = out_features
        self.proj = nnx.Linear(feature_dim, num_tokens * out_features,
                               rngs=rngs)

    def __call__(self, features: jax.Array) -> ProjectionOutput:
        if features.ndim == 3:  # sequence features: mean-pool
            features = features.mean(axis=1)
        tokens = self.proj(features).reshape(
            features.shape[0], self.num_tokens, self.out_features
        )
        return ProjectionOutput(image_tokens=tokens)


class MLPProjector(nnx.Module):
    def __init__(self, feature_dim: int, out_features: int, num_tokens: int,
                 hidden_dim: int | None = None, *, rngs: nnx.Rngs):
        self.num_tokens = num_tokens
        self.out_features = out_features
        hidden = hidden_dim or feature_dim * 2
        self.fc1 = nnx.Linear(feature_dim, hidden, rngs=rngs)
        self.fc2 = nnx.Linear(hidden, num_tokens * out_features, rngs=rngs)

    def __call__(self, features: jax.Array) -> ProjectionOutput:
        if features.ndim == 3:
            features = features.mean(axis=1)
        h = jax.nn.gelu(self.fc1(features), approximate=False)
        tokens = self.fc2(h).reshape(
            features.shape[0], self.num_tokens, self.out_features
        )
        return ProjectionOutput(image_tokens=tokens)


class Resampler(nnx.Module):
    """Perceiver-style: N learnable latents cross-attend to the feature
    sequence (one fused attention — MXU-friendly, no KV cache needed)."""

    def __init__(self, feature_dim: int, out_features: int, num_tokens: int,
                 num_heads: int = 8, *, rngs: nnx.Rngs):
        self.num_tokens = num_tokens
        self.num_heads = num_heads
        self.out_features = out_features
        assert out_features % num_heads == 0
        self.latents = nnx.Param(
            jax.random.normal(rngs.params(), (num_tokens, out_features))
            * (out_features ** -0.5)
        )
        self.to_kv = nnx.Linear(feature_dim, out_features * 2, rngs=rngs)
        self.to_q = nnx.Linear(out_features, out_features, rngs=rngs)
        self.to_out = nnx.Linear(out_features, out_features, rngs=rngs)
        self.norm = nnx.LayerNorm(out_features, rngs=rngs)

    def __call__(self, features: jax.Array) -> ProjectionOutput:
        if features.ndim == 2:
            features = features[:, None, :]
        b, s, _ = features.shape
        h = self.num_heads
        d = self.out_features // h
        q = self.to_q(jnp.broadcast_to(
            self.latents.value, (b, self.num_tokens, self.out_features)
        )).reshape(b, self.num_tokens, h, d)
        k, v = jnp.split(self.to_kv(features), 2, axis=-1)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        attn = jax.nn.dot_product_attention(q, k, v)
        out = self.to_out(attn.reshape(b, self.num_tokens, -1))
        return ProjectionOutput(image_tokens=self.norm(out))


_PROJECTORS = {
    "linear": LinearProjector,
    "mlp": MLPProjector,
    "resampler": Resampler,
}


class PFGManager:
    """Projector factory + adapter-format IO (no UNet surgery)."""

    def __init__(self, adapter_config: PFGConfig):
        self.adapter_config = adapter_config
        self.projector: nnx.Module | None = None

    def get_projector(self, out_features: int, *,
                      rngs: nnx.Rngs | None = None) -> nnx.Module:
        rngs = rngs or nnx.Rngs(0)
        cfg = self.adapter_config
        cls = _PROJECTORS[cfg.projector_type]
        self.projector = cls(
            feature_dim=cfg.image_encoder.feature_dim,
            out_features=out_features,
            num_tokens=cfg.num_image_tokens,
            **cfg.projector_args,
            rngs=rngs,
        )
        return self.projector

    def apply_adapter(self, model, *, rngs=None) -> list[str]:
        """PFG does not patch attention — context concat happens at the
        pipeline level. Kept for manager-interface parity."""
        return []

    def set_adapter_trainable(self, trainable: bool = True) -> None:
        if trainable and self.projector is not None:
            retype_to_adapter_params(self.projector)

    # --------------------------------------------------------------- io

    def get_state_dict(self) -> dict[str, np.ndarray]:
        from ..models.sdxl.convert import unet_nnx_to_torch
        from ..utils.state_dict import flatten_state

        assert self.projector is not None
        flat = {
            k: np.asarray(v)
            for k, v in flatten_state(self.projector).items()
        }
        return {
            f"projector.{k}": v for k, v in unet_nnx_to_torch(flat).items()
        }

    def load_adapter_state(self, sd: dict[str, np.ndarray]) -> None:
        from ..models.sdxl.convert import unet_torch_to_nnx
        from ..utils.state_dict import load_flat_state

        assert self.projector is not None
        proj = {
            k[len("projector."):]: v for k, v in sd.items()
            if k.startswith("projector.")
        }
        load_flat_state(self.projector, unet_torch_to_nnx(proj), strict=False)
