"""SDXL rectified-flow conversion adapter (rebuild of reference
``src/models/sdxl/adapter/flow_match.py``).

Retargets the SDXL UNet to flow matching: timesteps 1000 -> 1, sigma = t/1000,
plain Euler v update; x0-prediction converts through
:func:`convert_x0_to_velocity`.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ....ops.loss.flow_match import ModelPredictionType, convert_x0_to_velocity
from ....utils import PromptType
from ..config import SDXLConfig
from ..pipeline import SDXLModel, _denoise_step


class SDXLFlowMatchConfig(SDXLConfig):
    model_prediction: ModelPredictionType = "velocity"
    noise_scale: float = 1.0
    clean_at_zero: bool = False
    timestep_eps: float = 1e-5


class SDXLFlowMatch(SDXLModel):
    """Reference ``flow_match.py:22-189``."""

    config: SDXLFlowMatchConfig

    def prepare_timesteps(self, num_inference_steps: int):
        """1000 -> 1 timesteps; sigma = t/1000 with a 0 terminator
        (reference ``flow_match.py:28-46``)."""
        timesteps = np.linspace(
            1000.0, 1.0, num_inference_steps, dtype=np.float32
        )
        sigmas = np.concatenate([timesteps / 1000.0, [0.0]]).astype(np.float32)
        return timesteps, sigmas

    def generate(
        self,
        prompt: PromptType,
        negative_prompt: PromptType | None = None,
        width: int = 768,
        height: int = 768,
        original_size: tuple[int, int] | None = None,
        target_size: tuple[int, int] | None = None,
        crop_coords_top_left: tuple[int, int] = (0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        max_token_length: int = 75,
        seed: int | None = None,
        execution_dtype=jnp.bfloat16,
        do_offloading: bool = False,
        return_latents: bool = False,
    ) -> list[Image.Image] | jax.Array:
        cfg = self.config
        do_cfg = cfg_scale > 1.0
        timesteps, sigmas = self.prepare_timesteps(num_inference_steps)
        batch_size = len(prompt) if isinstance(prompt, list) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        encoder_output = self.text_encoder.encode_prompts(
            prompt, negative_prompt, use_negative_prompts=do_cfg,
            max_token_length=max_token_length,
        )
        latents = (
            self.prepare_latents(
                batch_size, height, width, execution_dtype,
                max_noise_sigma=1.0, seed=seed,
            )
            * cfg.noise_scale
        )
        ehs, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        ehs = ehs.astype(execution_dtype)
        pooled = pooled.astype(execution_dtype)
        n = ehs.shape[0]
        osz = jnp.broadcast_to(jnp.asarray(original_size, jnp.float32), (n, 2))
        tsz = jnp.broadcast_to(jnp.asarray(target_size, jnp.float32), (n, 2))
        crop = jnp.broadcast_to(
            jnp.asarray(crop_coords_top_left, jnp.float32), (n, 2)
        )

        for i, t in enumerate(timesteps):
            latent_in = jnp.concatenate([latents] * 2) if do_cfg else latents
            t_batch = jnp.full((latent_in.shape[0],), t, dtype=jnp.float32)
            model_pred = _denoise_step(
                self.denoiser, latent_in, t_batch, ehs, pooled, osz, tsz, crop
            )
            if cfg.model_prediction == "image":
                velocity = convert_x0_to_velocity(
                    model_pred, latent_in, t_batch / 1000.0,
                    eps=cfg.timestep_eps, clean_at_zero=cfg.clean_at_zero,
                )
            elif cfg.model_prediction == "velocity":
                velocity = model_pred
            else:
                raise ValueError(
                    f"Unknown model_prediction: {cfg.model_prediction}"
                )
            if do_cfg:
                v_pos, v_neg = jnp.split(velocity, 2, axis=0)
                velocity = v_neg + cfg_scale * (v_pos - v_neg)
            dt = float(sigmas[i + 1] - sigmas[i])
            latents = latents + velocity.astype(latents.dtype) * dt

        if return_latents:
            return latents
        return self.decode_image(latents)
