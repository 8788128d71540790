"""SDXL PFG training workloads (rebuild of reference
``train/sdxl/prompt_free.{self,ref}.py``).

self-variant: the training image itself is the PFG reference; ref-variant:
the batch carries a separate ``reference_image``. The projector trains
(AdapterParam); optionally LoRA on the UNet. Image tokens are concatenated to
the text context along the sequence axis.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from ..adapters.ip_adapter import retype_to_adapter_params
from ..models.sdxl.adapter.prompt_free import (
    SDXLModelWithPFG,
    SDXLModelWithPFGConfig,
)
from ..ops.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ..ops.timestep.sampling import gaussian_randint, uniform_randint
from ..peft import get_adapter_parameters
from .sdxl_text_to_image import SDXLForTextToImageTraining, SDXLTrainable


class SDXLModelWithPFGTrainingConfig(SDXLModelWithPFGConfig):
    """Reference ``prompt_free.self.py:29-36``."""

    max_token_length: int = 75
    drop_image_rate: float = 0.1
    freeze_vision_encoder: bool = True
    timestep_sampling: Literal["uniform", "gaussian"] = "uniform"
    timestep_sampling_args: dict = {}


class PFGTrainable(nnx.Module):
    def __init__(self, denoiser, projector, text_encoder_1, text_encoder_2,
                 vae):
        self.denoiser = denoiser
        self.projector = projector
        self.text_encoder = nnx.Dict(
            text_encoder_1=text_encoder_1, text_encoder_2=text_encoder_2
        )
        self.vae = vae


class SDXLPFGSelfTraining(SDXLForTextToImageTraining):
    """Reference ``prompt_free.self.py:39-333``."""

    model: SDXLModelWithPFG
    model_config: SDXLModelWithPFGTrainingConfig
    model_config_class = SDXLModelWithPFGTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        if not cfg.freeze_vision_encoder:
            raise NotImplementedError(
                "training the vision tower needs local pretrained weights; "
                "only freeze_vision_encoder=True is supported offline"
            )
        self.model = SDXLModelWithPFG(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        else:
            self.model.init_adapter()
        # the projector always trains -> AdapterParams + PEFT wrt filter
        retype_to_adapter_params(self.model.projector)
        self.model.manager.set_adapter_trainable(True)
        self._full_trainable = PFGTrainable(
            self.model.denoiser,
            self.model.projector,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )
        self._set_is_peft(True)
        self._drop_rng = np.random.default_rng(self.config.seed + 11)

    def trainable(self) -> nnx.Module:
        return self._full_trainable

    def _sample_timesteps(self, key: jax.Array, batch_size: int) -> jax.Array:
        args = self.model_config.timestep_sampling_args
        if self.model_config.timestep_sampling == "gaussian":
            return gaussian_randint(
                key, batch_size,
                min_timesteps=args.get("min_timesteps", 0),
                max_timesteps=args.get("max_timesteps", 1000),
                mean=args.get("mean", 100),
                std=args.get("std", 100),
            )
        return uniform_randint(
            key, batch_size,
            min_timesteps=args.get("min_timesteps", 0),
            max_timesteps=args.get("max_timesteps", 1000),
        )

    def _reference_pixels(self, source) -> jax.Array:
        """NHWC [-1, 1] training images -> vision-tower input."""
        if not isinstance(source, jax.Array):
            source = jnp.asarray(np.asarray(source))
        size = self.model_config.adapter.image_size
        resized = jax.image.resize(
            source, (source.shape[0], size, size, source.shape[-1]), "linear"
        )
        return self.model.preprocess_reference_image(resized)

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        arrays = super().prepare_batch(batch, key)
        ref_source = batch.get("reference_image")
        arrays["reference_pixels"] = self._reference_pixels(
            arrays["image"] if ref_source is None else ref_source
        )
        drop = self._drop_rng.random(arrays["image"].shape[0]) < (
            self.model_config.drop_image_rate
        )
        arrays["drop_image"] = jnp.asarray(drop)
        return arrays

    def compute_loss(self, trainable: PFGTrainable, batch, key):
        images = batch["image"]
        batch_size = images.shape[0]
        k_vae, k_t, k_noise = jax.random.split(jax.random.fold_in(key, 5), 3)

        ehs, pooled = self._encode_text(
            trainable, batch["ids1"], batch["ids2"], batch_size
        )
        vae = self.model.vae
        latents = jax.lax.stop_gradient(
            vae.encode(images).sample(k_vae) * vae.scaling_factor
        )
        timesteps = self._sample_timesteps(k_t, batch_size)
        noisy, noise = prepare_noised_latents(k_noise, latents, timesteps)

        features = jax.lax.stop_gradient(
            self.model.vision_encoder(batch["reference_pixels"])
        )
        image_tokens = trainable.projector(features).image_tokens
        image_tokens = jnp.where(
            batch["drop_image"][:, None, None], 0.0, image_tokens
        )
        # concat to the context sequence (reference prompt_free.self.py:185)
        ehs = jnp.concatenate(
            [ehs, image_tokens.astype(ehs.dtype)], axis=1
        )

        noise_pred = trainable.denoiser(
            noisy,
            timesteps.astype(jnp.float32),
            ehs,
            pooled,
            batch["original_size"],
            batch["target_size"],
            batch["crop_coords_top_left"],
        )
        l2_loss = loss_with_predicted_noise(latents, noise, noise_pred)
        return l2_loss, {"l2_loss": l2_loss}

    # ------------------------------------------------------------ save

    def get_state_dict_to_save(self) -> dict[str, np.ndarray]:
        sd = self.model.adapter_state_dict()
        if self.config.peft is not None:
            from ..models.sdxl.convert import convert_to_comfy_key

            peft_sd = get_adapter_parameters(self._full_trainable.denoiser)
            sd |= {convert_to_comfy_key(k): np.asarray(v)
                   for k, v in peft_sd.items()}
        return sd

    def get_metadata_to_save(self) -> dict[str, str]:
        cfg = self.model_config.adapter
        if cfg.projector_type == "resampler":
            return {"num_heads": str(cfg.projector_args.get("num_heads", 8))}
        return {}

    def preview_step(self, preview_args, preview_index: int) -> list[Image.Image]:
        reference_image = None
        extra = getattr(preview_args, "extra", None) or {}
        if path := extra.get("reference_image_path"):
            reference_image = Image.open(path).convert("RGB")
        return self.model.generate(
            prompt=preview_args.prompt,
            negative_prompt=preview_args.negative_prompt or "",
            reference_image=reference_image,
            width=preview_args.width,
            height=preview_args.height,
            num_inference_steps=preview_args.num_steps,
            cfg_scale=preview_args.cfg_scale,
            seed=preview_args.seed,
            max_token_length=self.model_config.max_token_length,
        )


class SDXLPFGRefTraining(SDXLPFGSelfTraining):
    """Reference-image variant (reference ``prompt_free.ref.py``); expects
    'reference_image' in the batch (ReferencedTextToImage dataset)."""
