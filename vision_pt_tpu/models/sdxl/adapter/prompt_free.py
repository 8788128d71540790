"""SDXL + PFG (Prompt-Free Generation) pipeline (rebuild of reference
``src/models/sdxl/adapter/prompt_free.py``).

A vision tower encodes a reference image; the projector turns the features
into ``num_image_tokens`` pseudo context tokens concatenated to the text
embeddings along the sequence axis (reference ``prompt_free.py:240-245``).
No UNet surgery — the tokens ride regular cross attention.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ....adapters.prompt_free import PFGConfig, PFGManager, ProjectionOutput
from ....data.transforms import ColorChannelSwap, PaddedResize
from ...auto import AutoImageEncoder
from ..config import SDXLConfig
from ..pipeline import SDXLModel


class SDXLModelWithPFGConfig(SDXLConfig):
    adapter: PFGConfig = PFGConfig()


class SDXLModelWithPFG(SDXLModel):
    """Reference ``prompt_free.py:21-316``."""

    config: SDXLModelWithPFGConfig

    def __init__(self, config: SDXLModelWithPFGConfig, *,
                 rngs: nnx.Rngs | None = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, rngs=rngs, **kw)
        adapter_cfg = config.adapter
        self.vision_encoder = AutoImageEncoder(config=adapter_cfg.image_encoder)
        self.manager = PFGManager(adapter_config=adapter_cfg)
        self.projector = self.manager.get_projector(
            out_features=config.denoiser.context_dim, rngs=rngs
        )
        self._resize = PaddedResize(
            max_size=adapter_cfg.image_size, fill=adapter_cfg.background_color
        )
        self._channel_swap = (
            ColorChannelSwap((2, 1, 0))
            if adapter_cfg.color_channel == "bgr" else None
        )
        self._mean = np.asarray(adapter_cfg.image_mean, dtype=np.float32)
        self._std = np.asarray(adapter_cfg.image_std, dtype=np.float32)

    def init_adapter(self) -> list[str]:
        return self.manager.apply_adapter(self)

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        super()._load_checkpoint(checkpoint_path, strict=strict)
        if self.config.adapter.checkpoint_weight:
            from safetensors.numpy import load_file

            self.manager.load_adapter_state(
                load_file(self.config.adapter.checkpoint_weight)
            )

    def adapter_state_dict(self) -> dict[str, np.ndarray]:
        return self.manager.get_state_dict()

    # ---------------------------------------------------------- images

    def preprocess_reference_image(self, images) -> jax.Array:
        """PIL / array -> padded square, optional BGR, normalized NHWC."""
        if isinstance(images, Image.Image):
            images = [images]
        if isinstance(images, (jax.Array, np.ndarray)):
            arr = np.asarray(images, dtype=np.float32)
            if arr.ndim == 3:
                arr = arr[None]
            if arr.min() < -0.01:  # [-1, 1] -> [0, 1]
                arr = (arr + 1.0) / 2.0
            if self._channel_swap is not None:
                arr = arr[..., [2, 1, 0]]
            return jnp.asarray((arr - self._mean) / self._std)
        arrays = []
        for img in images:
            padded = self._resize(img.convert("RGB"))
            a = np.asarray(padded, dtype=np.float32) / 255.0
            if self._channel_swap is not None:
                a = self._channel_swap(a)
            arrays.append((a - self._mean) / self._std)
        return jnp.asarray(np.stack(arrays))

    def encode_reference_image(self, pixel_values: jax.Array) -> jax.Array:
        features = self.vision_encoder(pixel_values)
        projection: ProjectionOutput = self.projector(features)
        return projection.image_tokens

    # ---------------------------------------------------------- generate

    def generate(self, prompt, *args, reference_image=None,
                 image_tokens=None, **kwargs):
        """Reference ``prompt_free.py:155-316``: tokens for the positive CFG
        half, zeros for the negative half."""
        if image_tokens is None and reference_image is not None:
            pixels = (
                reference_image if isinstance(reference_image, jax.Array)
                else self.preprocess_reference_image(reference_image)
            )
            image_tokens = self.encode_reference_image(pixels)
        if image_tokens is not None:
            batch = len(prompt) if isinstance(prompt, list) else 1
            if image_tokens.shape[0] == 1 and batch > 1:
                image_tokens = jnp.tile(image_tokens, (batch, 1, 1))
            do_cfg = kwargs.get("cfg_scale", 3.5) > 1.0
            if do_cfg:
                image_tokens = jnp.concatenate(
                    [image_tokens, jnp.zeros_like(image_tokens)], axis=0
                )
            kwargs["extra_context_tokens"] = image_tokens
        return super().generate(prompt, *args, **kwargs)
