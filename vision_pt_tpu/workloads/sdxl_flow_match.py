"""SDXL flow-match conversion fine-tuning (rebuild of reference
``train/sdxl/flow_match.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.sdxl.adapter.flow_match import SDXLFlowMatch, SDXLFlowMatchConfig
from ..ops.loss.flow_match import (
    ModelPredictionType,
    convert_x0_to_velocity,
    loss_with_predicted_velocity,
    prepare_scaled_noised_latents,
)
from ..ops.timestep.sampling import TimestepSamplingType, sample_timestep
from .sdxl_text_to_image import SDXLForTextToImageTraining, SDXLTrainable


class SDXLForFlowMatchingTrainingConfig(SDXLFlowMatchConfig):
    max_token_length: int = 225
    loss_type: ModelPredictionType = "velocity"
    timestep_sampling: TimestepSamplingType = "scale_shift_sigmoid"
    timestep_std: float = 0.8
    timestep_mean: float = -0.8


class SDXLForFlowMatchingTraining(SDXLForTextToImageTraining):
    model: SDXLFlowMatch
    model_config: SDXLForFlowMatchingTrainingConfig
    model_config_class = SDXLForFlowMatchingTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        self.model = SDXLFlowMatch.from_config(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        self._full_trainable = SDXLTrainable(
            self.model.denoiser,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )

    def _treat_fm_loss(self, model_pred, latents, noise, noisy, timestep):
        """Reference ``flow_match.py:49-107``."""
        cfg = self.model_config
        if cfg.model_prediction == "velocity":
            if cfg.loss_type == "velocity":
                return loss_with_predicted_velocity(latents, noise, model_pred)
            raise NotImplementedError(cfg.loss_type)
        if cfg.model_prediction == "image":
            if cfg.loss_type == "velocity":
                target_v = convert_x0_to_velocity(
                    latents, noisy, timestep, eps=cfg.timestep_eps,
                    clean_at_zero=cfg.clean_at_zero,
                )
                v_pred = convert_x0_to_velocity(
                    model_pred, noisy, timestep, eps=cfg.timestep_eps,
                    clean_at_zero=cfg.clean_at_zero,
                )
                return jnp.mean(
                    jnp.square(
                        v_pred.astype(jnp.float32) - target_v.astype(jnp.float32)
                    )
                )
            if cfg.loss_type == "image":
                return jnp.mean(
                    jnp.square(
                        model_pred.astype(jnp.float32)
                        - jax.lax.stop_gradient(latents).astype(jnp.float32)
                    )
                )
            raise NotImplementedError(cfg.loss_type)
        raise ValueError(f"Unknown model_prediction: {cfg.model_prediction}")

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_vae, k_t, k_noise = jax.random.split(jax.random.fold_in(key, 3), 3)

        denoiser = (
            trainable.denoiser if isinstance(trainable, SDXLTrainable)
            else trainable
        )
        ehs, pooled = self._encode_text(
            trainable, batch["ids1"], batch["ids2"], batch_size
        )
        dist = self.model.vae.encode(images)
        latents = jax.lax.stop_gradient(
            dist.sample(k_vae) * self.model.vae.scaling_factor
        )
        sampler_kwargs = {}
        if cfg.timestep_sampling == "scale_shift_sigmoid":
            sampler_kwargs = {"std": cfg.timestep_std, "mean": cfg.timestep_mean}
        timesteps = (
            sample_timestep(k_t, batch_size, cfg.timestep_sampling,
                            **sampler_kwargs)
            * 1000.0
        )
        noisy, noise = prepare_scaled_noised_latents(
            k_noise, latents, timesteps / 1000.0,
            noise_scale=cfg.noise_scale, clean_at_zero=cfg.clean_at_zero,
        )
        model_pred = denoiser(
            noisy, timesteps, ehs, pooled,
            batch["original_size"], batch["target_size"],
            batch["crop_coords_top_left"],
        )
        loss = self._treat_fm_loss(
            model_pred, latents, noise, noisy, timesteps / 1000.0
        )
        return loss, {"l2_loss": loss}
