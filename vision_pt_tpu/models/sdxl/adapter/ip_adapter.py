"""SDXL + IP-Adapter pipeline (rebuild of reference
``src/models/sdxl/adapter/ip_adapter.py:995-1379``)."""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ....adapters.ip_adapter import (
    IPAdapterConfig,
    IPAdapterManager,
    get_ip_adapter_class,
)
from ....data.transforms import ColorChannelSwap, PaddedResize
from ...auto import AutoImageEncoder
from ..config import SDXLConfig
from ..pipeline import SDXLModel


class SDXLModelWithIPAdapterConfig(SDXLConfig):
    adapter: IPAdapterConfig = IPAdapterConfig()


class SDXLModelWithIPAdapter(SDXLModel):
    """Reference ``ip_adapter.py:999-1379``: image encoder + adapter manager
    + projector + BGR/padded preprocessing wired onto the SDXL pipeline."""

    config: SDXLModelWithIPAdapterConfig

    def __init__(self, config: SDXLModelWithIPAdapterConfig, *,
                 rngs: nnx.Rngs | None = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, rngs=rngs, **kw)
        adapter_cfg = config.adapter
        self.encoder = AutoImageEncoder(config=adapter_cfg.image_encoder)
        self.manager = IPAdapterManager(
            adapter_class=get_ip_adapter_class(adapter_cfg.variant),
            adapter_config=adapter_cfg,
        )
        self.image_proj = self.manager.get_projector(
            attention_dim=config.denoiser.context_dim, rngs=rngs
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
        self._adapter_rngs = rngs

    def init_adapter(self) -> list[str]:
        """Apply the adapter over attn2 modules (reference
        ``ip_adapter.py:1081-1083``)."""
        return self.manager.apply_adapter(self, rngs=self._adapter_rngs)

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        super()._load_checkpoint(checkpoint_path, strict=strict)
        self.init_adapter()
        if self.config.adapter.checkpoint_weight:
            from safetensors.numpy import load_file

            sd = load_file(self.config.adapter.checkpoint_weight)
            self.manager.load_adapter_state(
                {
                    k[len("ip_adapter."):]: v for k, v in sd.items()
                    if k.startswith("ip_adapter.")
                }
            )
            from ....utils.state_dict import load_flat_state

            proj = {
                k[len("image_proj."):]: v for k, v in sd.items()
                if k.startswith("image_proj.")
            }
            if proj:
                # torch-layout -> nnx
                from ..convert import unet_torch_to_nnx

                load_flat_state(
                    self.image_proj, unet_torch_to_nnx(proj), strict=False
                )

    def adapter_state_dict(self) -> dict[str, np.ndarray]:
        """Exported as ip_adapter.* + image_proj.* (the reference's format)."""
        from ....utils.state_dict import flatten_state
        from ..convert import unet_nnx_to_torch

        out = {
            f"ip_adapter.{k}": v
            for k, v in self.manager.get_state_dict().items()
        }
        proj = unet_nnx_to_torch(
            {k: np.asarray(v) for k, v in flatten_state(self.image_proj).items()}
        )
        out.update({f"image_proj.{k}": v for k, v in proj.items()})
        return out

    # ---------------------------------------------------------- images

    def preprocess_reference_images(self, images) -> jax.Array:
        """PIL -> padded square, optional BGR, CLIP-normalized NHWC."""
        if isinstance(images, Image.Image):
            images = [images]
        arrays = []
        for img in images:
            padded = self._resize(img.convert("RGB"))
            arr = np.asarray(padded, dtype=np.float32) / 255.0
            if self._channel_swap is not None:
                arr = self._channel_swap(arr)
            arr = (arr - self._mean) / self._std
            arrays.append(arr)
        return jnp.asarray(np.stack(arrays))

    def encode_reference_images(self, images) -> jax.Array:
        """images -> ip tokens (B, num_ip_tokens, context_dim)."""
        pixel_values = (
            images if isinstance(images, jax.Array)
            else self.preprocess_reference_images(images)
        )
        features = self.encoder(pixel_values)
        return self.image_proj(features)

    # ---------------------------------------------------------- generate

    def generate(self, prompt, *args, reference_images=None,
                 ip_tokens=None, **kwargs):
        if ip_tokens is None and reference_images is not None:
            ip_tokens = self.encode_reference_images(reference_images)
        if ip_tokens is not None:
            batch = len(prompt) if isinstance(prompt, list) else 1
            do_cfg = kwargs.get("cfg_scale", 3.5) > 1.0
            if do_cfg:
                # zero ip tokens for the negative half
                ip_tokens = jnp.concatenate(
                    [ip_tokens, jnp.zeros_like(ip_tokens)], axis=0
                )
            kwargs["cross_attention_kwargs"] = {"ip_tokens": ip_tokens}
        return super().generate(prompt, *args, **kwargs)
