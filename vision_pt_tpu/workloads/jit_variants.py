"""JiT variant training workloads (rebuild of reference
``train/jit/{arb_class_to_image,class_to_image_{ujit,ig,loig,cross,tread}}.py``).

All share JiTForClassToImageTraining's host prep / loss treatment; each
variant swaps the model class and (where the reference does) adds its extra
loss terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.jit.extension.cross import (
    CrossJiTConfig,
    CrossJiTDenoiserConfig,
    CrossJiTModel,
)
from ..models.jit.extension.ig import IGJiTConfig, IGJiTDenoiserConfig, IGJiTModel
from ..models.jit.extension.loig import (
    LoIGJiTConfig,
    LoIGJiTDenoiserConfig,
    LoIGJiTModel,
)
from ..models.jit.extension.tread import (
    JiTWithTreadConfig,
    JiTWithTreadDenoiserConfig,
    JiTWithTreadModel,
)
from ..models.jit.extension.uvit import UJiTConfig, UJiTDenoiserConfig, UJiTModel
from ..ops.loss.flow_match import prepare_scaled_noised_latents
from ..ops.timestep.sampling import sample_timestep
from .jit_class_to_image import JiTConfigForTraining, JiTForClassToImageTraining


def _area_downsample(x: jax.Array, scale: float) -> jax.Array:
    """torch F.interpolate(mode='area') analog for integer 1/scale factors."""
    factor = int(round(1.0 / scale))
    return nnx.avg_pool(
        x, window_shape=(factor, factor), strides=(factor, factor)
    )


# ------------------------------------------------------------------- ARB


class JiTConfigForArbTraining(JiTConfigForTraining):
    lowres_loss: list[float] = []  # e.g. [0.5, 0.25]


class JiTForArbClassToImageTraining(JiTForClassToImageTraining):
    """ARB variant: batch provides per-sample size conditioning and optional
    multi-resolution lowres losses (reference ``arb_class_to_image.py``)."""

    model_config: JiTConfigForArbTraining
    model_config_class = JiTConfigForArbTraining

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        arrays = super().prepare_batch(batch, key)
        for name in ("original_size", "target_size", "crop_coords_top_left"):
            if name in batch:
                arrays[name] = jnp.asarray(batch[name], dtype=jnp.float32)
        return arrays

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_t, k_noise = jax.random.split(jax.random.fold_in(key, 1))

        context = trainable.class_encoder(batch["class_ids"])
        if not cfg.train_class_encoder:
            context = jax.lax.stop_gradient(context)

        timesteps = sample_timestep(k_t, batch_size, cfg.timestep_sampling)
        noisy, noise = prepare_scaled_noised_latents(
            k_noise, images, timesteps, noise_scale=cfg.noise_scale
        )

        default_size = jnp.tile(
            jnp.asarray([[images.shape[1], images.shape[2]]], dtype=jnp.float32),
            (batch_size, 1),
        )
        original_size = batch.get("original_size", default_size)
        target_size = batch.get("target_size", default_size)
        crop_coords = batch.get(
            "crop_coords_top_left", jnp.zeros_like(default_size)
        )

        model_pred = trainable.denoiser(
            noisy, timesteps, context, original_size, target_size, crop_coords,
            context_mask=batch["context_mask"],
        )
        l2_loss = self._treat_loss(model_pred, noisy, images, noise, timesteps)
        total = l2_loss
        metrics = {"l2_loss": l2_loss}

        for idx, scale in enumerate(cfg.lowres_loss):
            if scale <= 0.0:
                continue
            lowres_images = _area_downsample(images, scale)
            lowres_noisy = _area_downsample(noisy, scale)
            lowres_noise = _area_downsample(noise, scale)
            lh, lw = lowres_images.shape[1], lowres_images.shape[2]
            lowres_tsize = jnp.tile(
                jnp.asarray([[lh, lw]], dtype=jnp.float32), (batch_size, 1)
            )
            lowres_pred = trainable.denoiser(
                lowres_noisy, timesteps, context,
                original_size * scale, lowres_tsize, crop_coords * scale,
                context_mask=batch["context_mask"],
            )
            lowres_l2 = self._treat_loss(
                lowres_pred, lowres_noisy, lowres_images, lowres_noise, timesteps
            )
            metrics[f"lowres_loss_{idx}"] = lowres_l2
            total = total + lowres_l2

        return total, metrics


# ------------------------------------------------------------------- U-JiT


class UJiTConfigForTraining(JiTConfigForTraining):
    denoiser: "UJiTDenoiserConfig" = None  # re-annotated below


class JiTForUJiTTraining(JiTForClassToImageTraining):
    model_class = UJiTModel
    model_config_class = UJiTConfigForTraining


class ArbUJiTConfigForTraining(JiTConfigForArbTraining):
    denoiser: "UJiTDenoiserConfig" = None


class JiTForArbUJiTTraining(JiTForArbClassToImageTraining):
    model_class = UJiTModel
    model_config_class = ArbUJiTConfigForTraining


# ------------------------------------------------------------------- cross


class CrossJiTConfigForTraining(JiTConfigForTraining):
    denoiser: "CrossJiTDenoiserConfig" = None


class JiTForCrossTraining(JiTForClassToImageTraining):
    model_class = CrossJiTModel
    model_config_class = CrossJiTConfigForTraining


# ------------------------------------------------------------------- IG


class IGJiTConfigForTraining(JiTConfigForTraining):
    denoiser: "IGJiTDenoiserConfig" = None
    ig_scale: float = 1.0
    intermediate_loss_weight: float = 0.5


class JiTForIGTraining(JiTForClassToImageTraining):
    """Internal-guidance training (reference ``class_to_image_ig.py:100-154``):
    the main loss targets images + ig_scale * stop_grad(pred - intermediate);
    the intermediate head is trained toward the clean images."""

    model_class = IGJiTModel
    model_config_class = IGJiTConfigForTraining

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_t, k_noise = jax.random.split(jax.random.fold_in(key, 1))

        context = trainable.class_encoder(batch["class_ids"])
        if not cfg.train_class_encoder:
            context = jax.lax.stop_gradient(context)
        timesteps = sample_timestep(k_t, batch_size, cfg.timestep_sampling)
        noisy, noise = prepare_scaled_noised_latents(
            k_noise, images, timesteps, noise_scale=cfg.noise_scale
        )
        size = jnp.tile(
            jnp.asarray([[images.shape[1], images.shape[2]]], dtype=jnp.float32),
            (batch_size, 1),
        )
        model_pred, intermediate_pred = trainable.denoiser(
            noisy, timesteps, context, size, size, jnp.zeros_like(size),
            context_mask=batch["context_mask"],
        )
        guided_clean = images + cfg.ig_scale * jax.lax.stop_gradient(
            model_pred - intermediate_pred
        )
        l2_loss = self._treat_loss(model_pred, noisy, guided_clean, noise, timesteps)
        inter_loss = self._treat_loss(
            intermediate_pred, noisy, images, noise, timesteps
        )
        total = l2_loss + cfg.intermediate_loss_weight * inter_loss
        return total, {"l2_loss": l2_loss, "intermediate_l2_loss": inter_loss}


# ------------------------------------------------------------------- LoIG


class LoIGJiTConfigForTraining(JiTConfigForTraining):
    denoiser: "LoIGJiTDenoiserConfig" = None
    loig_loss_weight: float = 1.0


class JiTForLoIGTraining(JiTForClassToImageTraining):
    """Low-rank internal guidance (reference ``class_to_image_loig.py``)."""

    model_class = LoIGJiTModel
    model_config_class = LoIGJiTConfigForTraining

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_t, k_noise = jax.random.split(jax.random.fold_in(key, 1))
        context = trainable.class_encoder(batch["class_ids"])
        if not cfg.train_class_encoder:
            context = jax.lax.stop_gradient(context)
        timesteps = sample_timestep(k_t, batch_size, cfg.timestep_sampling)
        noisy, noise = prepare_scaled_noised_latents(
            k_noise, images, timesteps, noise_scale=cfg.noise_scale
        )
        size = jnp.tile(
            jnp.asarray([[images.shape[1], images.shape[2]]], dtype=jnp.float32),
            (batch_size, 1),
        )
        model_pred, weak_pred = trainable.denoiser(
            noisy, timesteps, context, size, size, jnp.zeros_like(size),
            context_mask=batch["context_mask"],
        )
        l2_loss = self._treat_loss(model_pred, noisy, images, noise, timesteps)
        loig_loss = self._treat_loss(weak_pred, noisy, images, noise, timesteps)
        total = l2_loss + cfg.loig_loss_weight * loig_loss
        return total, {"l2_loss": l2_loss, "loig_l2_loss": loig_loss}


# ------------------------------------------------------------------- TREAD


class TreadJiTConfigForTraining(JiTConfigForTraining):
    denoiser: "JiTWithTreadDenoiserConfig" = None


class JiTForTreadTraining(JiTForClassToImageTraining):
    """TREAD token-routing training (reference
    ``class_to_image_tread.py``); routing active only in the train step."""

    model_class = JiTWithTreadModel
    model_config_class = TreadJiTConfigForTraining

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        keys = jax.random.split(jax.random.fold_in(key, 1), 3)
        context = trainable.class_encoder(batch["class_ids"])
        if not cfg.train_class_encoder:
            context = jax.lax.stop_gradient(context)
        timesteps = sample_timestep(keys[0], batch_size, cfg.timestep_sampling)
        noisy, noise = prepare_scaled_noised_latents(
            keys[1], images, timesteps, noise_scale=cfg.noise_scale
        )
        size = jnp.tile(
            jnp.asarray([[images.shape[1], images.shape[2]]], dtype=jnp.float32),
            (batch_size, 1),
        )
        model_pred = trainable.denoiser(
            noisy, timesteps, context, size, size, jnp.zeros_like(size),
            context_mask=batch["context_mask"],
            route_key=keys[2],
        )
        l2_loss = self._treat_loss(model_pred, noisy, images, noise, timesteps)
        return l2_loss, {"l2_loss": l2_loss}
