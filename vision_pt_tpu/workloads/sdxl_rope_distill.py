"""SDXL RoPE-retrofit distillation workload (rebuild of reference
``train/sdxl/rope_distill.py``).

Trains the RoPE-retrofitted UNet (student) against its own frozen non-RoPE
forward (teacher): per step the same weights run twice — once with rotary
embeddings disabled + PEFT disabled + stop_gradient (teacher) and once
enabled (student) — plus an optional low-resolution pass of both for
resolution-generalization (reference ``rope_distill.py:169-342``). All four
passes trace into one XLA program; the enable/disable context managers flip
static flags at trace time so no runtime branching is emitted.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.sdxl.adapter.rope import (
    SDXLWithRoPEConfig,
    SDXLWithRoPEModel,
    while_rope_disabled,
    while_rope_enabled,
)
from ..ops.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ..ops.timestep.sampling import uniform_randint
from ..peft.functional import while_peft_disabled
from .sdxl_text_to_image import SDXLForTextToImageTraining, SDXLTrainable


class SDXLForRoPEDistillTrainingConfig(SDXLWithRoPEConfig):
    """Reference ``rope_distill.py:39-48``."""

    max_token_length: int = 225

    l2_loss_weight: float = 1.0
    distill_loss_weight: float = 1.0

    lowres_l2_loss_weight: float = 0.0
    lowres_distill_loss_weight: float = 1.0

    lowres_ratio: float = 2.0


def downscale(pixel_values, original_size, target_size, crop_coords,
              ratio: float):
    """Bicubic-downscaled pixels + rescaled size conditioning (NHWC;
    reference ``rope_distill.py:143-167``)."""
    b, h, w, c = pixel_values.shape
    resized = jax.image.resize(
        pixel_values,
        (b, math.ceil(h / ratio), math.ceil(w / ratio), c),
        method="cubic",
    )
    return (
        resized,
        jnp.ceil(original_size / ratio),
        jnp.ceil(target_size / ratio),
        jnp.floor(crop_coords / ratio),
    )


class SDXLRoPEDistillTraining(SDXLForTextToImageTraining):
    """Reference ``rope_distill.py:51-404``."""

    model: SDXLWithRoPEModel
    model_config: SDXLForRoPEDistillTrainingConfig
    model_config_class = SDXLForRoPEDistillTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        cfg.denoiser.rope_enabled = True  # force student mode
        self.model = SDXLWithRoPEModel(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        self._full_trainable = SDXLTrainable(
            self.model.denoiser,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )

    def _denoise(self, denoiser, noisy, timesteps, ehs, pooled,
                 original_size, target_size, crop_coords):
        return denoiser(
            noisy,
            timesteps.astype(jnp.float32),
            ehs,
            pooled,
            original_size,
            target_size,
            crop_coords,
        )

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_vae, k_t, k_noise, k_lr_vae, k_lr_noise = jax.random.split(
            jax.random.fold_in(key, 3), 5
        )

        denoiser = (
            trainable.denoiser if isinstance(trainable, SDXLTrainable)
            else trainable
        )
        vae = self.model.vae

        ehs, pooled = self._encode_text(
            trainable, batch["ids1"], batch["ids2"], batch_size
        )
        latents = jax.lax.stop_gradient(
            vae.encode(images).sample(k_vae) * vae.scaling_factor
        )
        timesteps = uniform_randint(k_t, batch_size, 0, 1000)
        noisy, noise = prepare_noised_latents(k_noise, latents, timesteps)

        args = (noisy, timesteps, ehs, pooled, batch["original_size"],
                batch["target_size"], batch["crop_coords_top_left"])

        # teacher: RoPE off, adapters off, no grads. The flag flips are
        # trace-time statics on the IN-TRACE denoiser (mutating the outer
        # self.model from inside jit raises TraceContextError), so both
        # variants land in one XLA program.
        teacher_pred = None
        if cfg.distill_loss_weight > 0:
            with while_peft_disabled(denoiser), while_rope_disabled(denoiser):
                assert not denoiser.rope_enabled
                teacher_pred = jax.lax.stop_gradient(
                    self._denoise(denoiser, *args)
                )

        with while_rope_enabled(denoiser):
            assert denoiser.rope_enabled
            student_pred = self._denoise(denoiser, *args)

        lowres_student = lowres_teacher = None
        lowres_latents = lowres_noise = None
        if cfg.lowres_l2_loss_weight > 0 or cfg.lowres_distill_loss_weight > 0:
            lr_pixels, lr_orig, lr_target, lr_crop = downscale(
                images,
                batch["original_size"],
                batch["target_size"],
                batch["crop_coords_top_left"],
                cfg.lowres_ratio,
            )
            lowres_latents = jax.lax.stop_gradient(
                vae.encode(lr_pixels).sample(k_lr_vae) * vae.scaling_factor
            )
            lowres_noisy, lowres_noise = prepare_noised_latents(
                k_lr_noise, lowres_latents, timesteps
            )
            lr_args = (lowres_noisy, timesteps, ehs, pooled, lr_orig,
                       lr_target, lr_crop)
            with while_rope_enabled(denoiser):
                lowres_student = self._denoise(denoiser, *lr_args)
            if cfg.lowres_distill_loss_weight > 0:
                with while_peft_disabled(denoiser), while_rope_disabled(
                    denoiser
                ):
                    lowres_teacher = jax.lax.stop_gradient(
                        self._denoise(denoiser, *lr_args)
                    )

        total = jnp.asarray(0.0, dtype=jnp.float32)
        metrics: dict[str, jax.Array] = {}
        if cfg.l2_loss_weight > 0:
            l2 = loss_with_predicted_noise(latents, noise, student_pred)
            metrics["l2_loss"] = l2
            total = total + l2 * cfg.l2_loss_weight
        if cfg.distill_loss_weight > 0:
            distill = jnp.mean(
                jnp.square(
                    student_pred.astype(jnp.float32)
                    - teacher_pred.astype(jnp.float32)
                )
            )
            metrics["distill_loss"] = distill
            total = total + distill * cfg.distill_loss_weight
        if cfg.lowres_l2_loss_weight > 0:
            lr_l2 = loss_with_predicted_noise(
                lowres_latents, lowres_noise, lowres_student
            )
            metrics["lowres_l2_loss"] = lr_l2
            total = total + lr_l2 * cfg.lowres_l2_loss_weight
        if cfg.lowres_distill_loss_weight > 0:
            lr_distill = jnp.mean(
                jnp.square(
                    lowres_student.astype(jnp.float32)
                    - lowres_teacher.astype(jnp.float32)
                )
            )
            metrics["lowres_distill_loss"] = lr_distill
            total = total + lr_distill * cfg.lowres_distill_loss_weight

        return total, metrics
