"""SDXL IP-Adapter training workloads (rebuild of reference
``train/sdxl/ip_adapter.{self,ref}.py``).

self-variant: the training image itself is the reference (re-preprocessed to
the vision tower's input stats); ref-variant: the batch carries a separate
``reference_image``. Only adapter params (AdapterParam) and the image
projector train; base UNet/encoders stay frozen via the wrt filter.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from ..models.sdxl.adapter.ip_adapter import (
    SDXLModelWithIPAdapter,
    SDXLModelWithIPAdapterConfig,
)
from ..ops.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ..ops.timestep.sampling import uniform_randint
from .sdxl_text_to_image import SDXLForTextToImageTraining, SDXLTrainable


class SDXLModelWithIPAdapterTrainingConfig(SDXLModelWithIPAdapterConfig):
    max_token_length: int = 225
    drop_image_rate: float = 0.15
    token_tail_drop: bool = False
    token_tail_drop_rate: float = 0.5
    token_tail_drop_sampling: Literal["uniform"] = "uniform"


class IPAdapterTrainable(nnx.Module):
    def __init__(self, denoiser, image_proj, text_encoder_1, text_encoder_2, vae):
        self.denoiser = denoiser  # holds the applied adapters (AdapterParams)
        self.image_proj = image_proj
        self.text_encoder = nnx.Dict(
            text_encoder_1=text_encoder_1, text_encoder_2=text_encoder_2
        )
        self.vae = vae


class SDXLIPAdapterSelfTraining(SDXLForTextToImageTraining):
    """Self-conditioning IP-Adapter training
    (reference ``ip_adapter.self.py:45-240``)."""

    model: SDXLModelWithIPAdapter
    model_config: SDXLModelWithIPAdapterTrainingConfig
    model_config_class = SDXLModelWithIPAdapterTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        self.model = SDXLModelWithIPAdapter(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        else:
            self.model.init_adapter()
        self._full_trainable = IPAdapterTrainable(
            self.model.denoiser,
            self.model.image_proj,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )
        # adapter params are AdapterParams -> train with the PEFT wrt filter
        self._set_is_peft(True)
        self._drop_rng = np.random.default_rng(self.config.seed + 7)

    def trainable(self) -> nnx.Module:
        return self._full_trainable

    def _reference_pixels(self, batch: dict) -> jax.Array:
        """NHWC [-1,1] -> vision-tower input (resized + CLIP stats)."""
        images = batch["image"]
        if not isinstance(images, jax.Array):
            images = jnp.asarray(images)
        size = self.model_config.adapter.image_size
        resized = jax.image.resize(
            images, (images.shape[0], size, size, images.shape[-1]), "linear"
        )
        zero_one = (resized + 1.0) / 2.0
        mean = jnp.asarray(self.model_config.adapter.image_mean)
        std = jnp.asarray(self.model_config.adapter.image_std)
        return (zero_one - mean) / std

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        arrays = super().prepare_batch(batch, key)
        ref_source = batch.get("reference_image", batch["image"])
        if not isinstance(ref_source, jax.Array):
            ref_source = jnp.asarray(np.asarray(ref_source))
        arrays["reference_pixels"] = self._reference_pixels(
            {"image": ref_source}
        )
        drop = self._drop_rng.random(arrays["image"].shape[0]) < (
            self.model_config.drop_image_rate
        )
        arrays["drop_image"] = jnp.asarray(drop)
        return arrays

    def compute_loss(self, trainable: IPAdapterTrainable, batch, key):
        images = batch["image"]
        batch_size = images.shape[0]
        k_vae, k_t, k_noise = jax.random.split(jax.random.fold_in(key, 4), 3)

        ehs, pooled = self._encode_text(
            trainable, batch["ids1"], batch["ids2"], batch_size
        )
        vae = self.model.vae
        latents = jax.lax.stop_gradient(
            vae.encode(images).sample(k_vae) * vae.scaling_factor
        )
        timesteps = uniform_randint(k_t, batch_size, 0, 1000)
        noisy, noise = prepare_noised_latents(k_noise, latents, timesteps)

        features = jax.lax.stop_gradient(
            self.model.encoder(batch["reference_pixels"])
        )
        ip_tokens = trainable.image_proj(features)
        ip_tokens = jnp.where(
            batch["drop_image"][:, None, None], 0.0, ip_tokens
        )

        noise_pred = trainable.denoiser(
            noisy,
            timesteps.astype(jnp.float32),
            ehs,
            pooled,
            batch["original_size"],
            batch["target_size"],
            batch["crop_coords_top_left"],
            cross_attention_kwargs={"ip_tokens": ip_tokens},
        )
        l2_loss = loss_with_predicted_noise(latents, noise, noise_pred)
        return l2_loss, {"l2_loss": l2_loss}

    def get_state_dict_to_save(self) -> dict[str, np.ndarray]:
        return self.model.adapter_state_dict()

    def preview_step(self, preview_args, preview_index: int) -> list[Image.Image]:
        return self.model.generate(
            prompt=preview_args.prompt,
            negative_prompt=preview_args.negative_prompt or "",
            width=preview_args.width,
            height=preview_args.height,
            num_inference_steps=preview_args.num_steps,
            cfg_scale=preview_args.cfg_scale,
            seed=preview_args.seed,
            max_token_length=self.model_config.max_token_length,
        )


class SDXLIPAdapterRefTraining(SDXLIPAdapterSelfTraining):
    """Reference-image variant (reference ``ip_adapter.ref.py``); expects
    'reference_image' in the batch (ReferencedTextToImage dataset)."""


class SDXLIPAdapterKyaraTraining(SDXLIPAdapterRefTraining):
    """Character-reference variant (reference ``ip_adapter.kyara.py``): no
    random image dropping, reference images arrive pre-normalized. The
    upstream ``src/dataset/kyara.py`` is missing from the reference repo;
    this uses the referenced text-to-image dataset instead."""

    def setup_model(self):
        super().setup_model()
        self.model_config.drop_image_rate = 0.0
