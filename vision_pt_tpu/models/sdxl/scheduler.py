"""EulerDiscrete scheduler (rebuild of reference
``src/models/sdxl/scheduler.py``; diffusers EulerDiscreteScheduler, leading
spacing, steps_offset=1).

Sigma tables are host-side NumPy (they're static per step count); the
ancestral step takes an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Scheduler:
    beta_start: float = 0.00085
    beta_end: float = 0.012
    num_train_timesteps: int = 1000
    steps_offset: int = 1

    def get_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Leading-spaced integer timesteps (reference ``scheduler.py:15-27``)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (
            np.arange(self.num_train_timesteps, 0, -step_ratio)
            .round()
            .astype(np.float32)
            - 1
        )
        return timesteps + self.steps_offset

    def get_sigmas(self, timesteps: np.ndarray) -> np.ndarray:
        """sigma = sqrt((1-acp)/acp), interpolated at timesteps, 0-terminated
        (reference ``scheduler.py:28-44``)."""
        betas = (
            np.linspace(
                self.beta_start**0.5,
                self.beta_end**0.5,
                self.num_train_timesteps,
                dtype=np.float32,
            )
            ** 2
        )
        alphas_cumprod = np.cumprod(1.0 - betas, dtype=np.float32)
        sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
        sigmas = np.interp(timesteps, np.arange(len(sigmas)), sigmas)
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def get_max_noise_sigma(self, sigmas: np.ndarray) -> float:
        return float(np.sqrt(np.max(sigmas) ** 2 + 1.0))

    def scale_model_input(self, sample: jax.Array, current_sigma) -> jax.Array:
        """1/sqrt(sigma^2+1) input scaling (reference ``scheduler.py:50-57``)."""
        return sample / jnp.sqrt(jnp.square(current_sigma) + 1.0).astype(
            sample.dtype
        )

    def ancestral_step(
        self,
        key: jax.Array,
        latent: jax.Array,
        noise_pred: jax.Array,
        sigma,
        next_sigma,
        noise: jax.Array | None = None,
    ) -> jax.Array:
        """Stochastic up/down split Euler-ancestral step
        (reference ``scheduler.py:59-77``). ``noise`` overrides the PRNG
        draw — used by parity tests and reproducible re-runs where the noise
        stream comes from file."""
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        next_sigma = jnp.asarray(next_sigma, dtype=jnp.float32)
        sigma_up = jnp.sqrt(
            next_sigma**2 * (sigma**2 - next_sigma**2) / sigma**2
        )
        sigma_down = jnp.sqrt(next_sigma**2 - sigma_up**2)
        dt = (sigma_down - sigma).astype(latent.dtype)
        if noise is None:
            noise = jax.random.normal(key, latent.shape, dtype=latent.dtype)
        return latent + noise_pred * dt + noise * sigma_up.astype(latent.dtype)

    def step(self, latent, noise_pred, sigma, next_sigma) -> jax.Array:
        """Plain Euler step (reference ``scheduler.py:79-86``)."""
        dt = jnp.asarray(next_sigma - sigma, dtype=jnp.float32)
        return latent + noise_pred * dt.astype(latent.dtype)
