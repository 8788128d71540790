"""DDPM epsilon-prediction noising and loss.

TPU-native rebuild of the reference's ``src/modules/loss/diffusion.py`` (the
diffusers DDPM ``add_noise`` formulation with the SD beta schedule).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NoisedLatents(NamedTuple):
    noisy_latents: jax.Array
    random_noise: jax.Array


@lru_cache(maxsize=8)
def _alphas_cumprod(
    beta_start: float, beta_end: float, num_train_timesteps: int
) -> np.ndarray:
    """sqrt-linspace-squared beta schedule cumprod
    (reference ``diffusion.py:15-53``)."""
    betas = (
        np.linspace(
            beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float32
        )
        ** 2
    )
    alphas = 1.0 - betas
    return np.cumprod(alphas, axis=0, dtype=np.float32)


def prepare_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,  # (B,) int, 0 <= t < num_train_timesteps
    max_sigma: float = 1.0,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    num_train_timesteps: int = 1000,
) -> NoisedLatents:
    """noisy = sqrt(acp[t]) * latents + sqrt(1-acp[t]) * noise."""
    acp = jnp.asarray(_alphas_cumprod(beta_start, beta_end, num_train_timesteps))
    a_t = acp[timestep]
    expand = (timestep.shape[0],) + (1,) * (latents.ndim - 1)
    sqrt_alpha = jnp.sqrt(a_t).reshape(expand).astype(latents.dtype)
    sqrt_one_minus = jnp.sqrt(1.0 - a_t).reshape(expand).astype(latents.dtype)
    noise = jax.random.normal(key, latents.shape, dtype=latents.dtype) * max_sigma
    noisy = sqrt_alpha * latents + sqrt_one_minus * noise
    return NoisedLatents(noisy, noise)


def loss_with_predicted_noise(
    latents: jax.Array,  # unused; kept for interface parity
    random_noise: jax.Array,
    predicted_noise: jax.Array,
) -> jax.Array:
    """eps-MSE (reference ``diffusion.py:57-68``)."""
    return jnp.mean(
        jnp.square(
            predicted_noise.astype(jnp.float32) - random_noise.astype(jnp.float32)
        )
    )
