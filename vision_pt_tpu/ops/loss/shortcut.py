"""Shortcut Models self-consistency loss (arXiv 2410.12557).

TPU-native rebuild of the reference's ``src/modules/loss/shortcut.py``.
The teacher two-half-step rollout runs under ``jax.lax.stop_gradient`` (the
reference uses ``torch.no_grad``); the denoiser is passed as a pure callable so
this composes with jit/remat.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ShortcutDuration(NamedTuple):
    inference_steps: jax.Array  # (B,) int, power-of-two step counts
    shortcut_exponent: jax.Array  # (B,) int, the exponent (dt_base)
    shortcut_duration: jax.Array  # (B,) float, dt = 1/steps
    departure_timesteps: jax.Array  # (B,) float, random start t (1 -> 0)


def sample_weighted_inference_step_exponent(
    key: jax.Array,
    batch_size: int,
    min_pow: int = 0,
    max_pow: int = 7,
) -> jax.Array:
    """Exponents sampled with sqrt weights (reference ``shortcut.py:26-39``)."""
    exponents = jnp.arange(min_pow, max_pow)
    logits = 0.5 * jnp.log(
        jnp.maximum(exponents.astype(jnp.float32), 1e-20)
    )  # log(sqrt(e))
    idx = jax.random.categorical(key, logits, shape=(batch_size,))
    return exponents[idx]


def prepare_random_shortcut_durations(
    key: jax.Array,
    batch_size: int,
    min_pow: int = 0,
    max_pow: int = 7,
) -> ShortcutDuration:
    """Random (steps, dt, departure t) triples (reference ``shortcut.py:42-77``).

    Departure timesteps are a/steps for a ~ U{1..steps}, computed with static
    shapes: draw u ~ U{1..2^max} then reduce modulo the per-sample step count.
    """
    k_exp, k_dep = jax.random.split(key)
    exponent = sample_weighted_inference_step_exponent(
        k_exp, batch_size, min_pow, max_pow
    )
    steps = (2**exponent).astype(jnp.int32)
    duration = 1.0 / steps.astype(jnp.float32)
    # a ~ U{1..steps}, statically shaped: sample U{0..2^max_pow-1} mod steps + 1
    raw = jax.random.randint(k_dep, (batch_size,), 0, 2 ** (max_pow - 1) * 2)
    a = (raw % steps) + 1
    departure = a.astype(jnp.float32) / steps.astype(jnp.float32)
    return ShortcutDuration(
        inference_steps=steps,
        shortcut_exponent=exponent,
        shortcut_duration=duration,
        departure_timesteps=departure,
    )


class ShortcutTargets(NamedTuple):
    first_shortcut: jax.Array
    second_shortcut: jax.Array


DenoiserFn = Callable[..., jax.Array]
"""denoiser(latents, encoder_hidden_states, timestep, shortcut_duration) -> v"""


def prepare_self_consistency_targets(
    denoiser: DenoiserFn,
    latents: jax.Array,
    encoder_hidden_states: jax.Array,
    departure_timesteps: jax.Array,
    double_shortcut_duration: jax.Array,
    cfg_scale: float = 1.0,
) -> ShortcutTargets:
    """Two half-step teacher predictions, gradient-stopped
    (reference ``shortcut.py:98-147``)."""
    half = double_shortcut_duration / 2.0
    first = (
        denoiser(
            latents,
            encoder_hidden_states,
            departure_timesteps,
            half,
        )
        * cfg_scale
    )
    expand = (latents.shape[0],) + (1,) * (latents.ndim - 1)
    pseudo_midpoint = latents - first * half.reshape(expand).astype(latents.dtype)
    second = (
        denoiser(
            pseudo_midpoint,
            encoder_hidden_states,
            departure_timesteps - half,
            half,
        )
        * cfg_scale
    )
    return ShortcutTargets(
        first_shortcut=jax.lax.stop_gradient(first),
        second_shortcut=jax.lax.stop_gradient(second),
    )


def get_shortcut_target_velocity(
    first_shortcut: jax.Array, second_shortcut: jax.Array
) -> jax.Array:
    """Average of the two half shortcuts (reference ``shortcut.py:150-157``)."""
    return (first_shortcut + second_shortcut) / 2.0


def loss_with_shortcut_self_consistency(
    first_shortcut: jax.Array,
    second_shortcut: jax.Array,
    double_shortcut: jax.Array,
) -> jax.Array:
    """MSE(double, avg(halves).detach()) (reference ``shortcut.py:160-173``)."""
    target = jax.lax.stop_gradient(
        (first_shortcut + second_shortcut) / 2.0
    ).astype(jnp.float32)
    return jnp.mean(jnp.square(double_shortcut.astype(jnp.float32) - target))
