"""Rectified-flow (flow-matching) noising and losses.

TPU-native rebuild of the reference's ``src/modules/loss/flow_match.py``.
Noise is drawn from an explicit key; everything is shape-polymorphic over
trailing dims (works for NHWC images and latent tensors alike).
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp

ModelPredictionType = Literal["noise", "velocity", "image"]  # eps, v, x0


class NoisedLatents(NamedTuple):
    noisy_latents: jax.Array
    random_noise: jax.Array


def _expand_t(timestep: jax.Array, like: jax.Array) -> jax.Array:
    """(B,) -> (B, 1, ..., 1) broadcastable against `like`."""
    return timestep.reshape(timestep.shape[0], *([1] * (like.ndim - 1))).astype(
        like.dtype
    )


def prepare_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,  # (B,), 1 -> 0 over sampling
    max_sigma: float = 1.0,
) -> NoisedLatents:
    """noisy = (1-t)*latents + t*noise (reference ``flow_match.py:13-57``)."""
    t = _expand_t(timestep, latents)
    noise = jax.random.normal(key, latents.shape, dtype=latents.dtype) * max_sigma
    noisy = (1.0 - t) * latents + t * noise
    return NoisedLatents(noisy, noise)


def prepare_scaled_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,
    noise_scale: float = 1.0,
    clean_at_zero: bool = False,
) -> NoisedLatents:
    """Scaled-noise variant with polarity switch (reference ``flow_match.py:60-74``).

    clean_at_zero=True:  noisy = (1-t)*latents + t*noise   (t=0 is clean)
    clean_at_zero=False: noisy = t*latents + (1-t)*noise   (t=1 is clean; JiT)
    """
    t = _expand_t(timestep, latents)
    noise = jax.random.normal(key, latents.shape, dtype=latents.dtype) * noise_scale
    if clean_at_zero:
        noisy = (1.0 - t) * latents + t * noise
    else:
        noisy = t * latents + (1.0 - t) * noise
    return NoisedLatents(noisy, noise)


def get_flow_match_target_velocity(
    latents: jax.Array, random_noise: jax.Array
) -> jax.Array:
    """v-target = noise - latents (reference ``flow_match.py:77-81``)."""
    return random_noise - latents


def loss_with_predicted_velocity(
    latents: jax.Array,
    random_noise: jax.Array,
    predicted_velocity: jax.Array,
) -> jax.Array:
    """Mean-squared error against the v-target (reference ``flow_match.py:85-96``)."""
    target = (random_noise - latents).astype(jnp.float32)
    return jnp.mean(jnp.square(predicted_velocity.astype(jnp.float32) - target))


def convert_x0_to_velocity(
    x0: jax.Array,
    noisy_latents: jax.Array,
    timestep: jax.Array,
    eps: float = 1e-5,
    clean_at_zero: bool = False,
) -> jax.Array:
    """x0-prediction -> velocity with epsilon-clamped denominator
    (reference ``flow_match.py:103-116``)."""
    t = _expand_t(timestep, x0)
    if clean_at_zero:
        return (noisy_latents - x0) / jnp.maximum(t, eps)
    return (x0 - noisy_latents) / jnp.maximum(1.0 - t, eps)
