"""Train-time timestep samplers.

TPU-native rebuild of the reference's ``src/modules/timestep/sampling.py``.
All samplers are pure functions over an explicit ``jax.random`` key (the
reference draws from torch's global RNG). Continuous samplers return float32
timesteps in [0, 1]; discrete (DDPM) samplers return int32 indices.
"""

from __future__ import annotations

import math
from typing import Callable, Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TimestepSamplingType = Literal[
    "shift_sigmoid",
    "flux_shift",
    "sigmoid",
    "uniform",
    "shift_uniform",
    "fraction_uniform",
    "shift_fraction_uniform",
    "scale_shift_sigmoid",
]


# MARK: flow-match


def get_lin_function(
    x1: float = 256.0, y1: float = 0.5, x2: float = 4096.0, y2: float = 1.15
) -> Callable[[float], float]:
    """Linear mu estimator for flux shift (reference ``sampling.py:10-19``)."""
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def time_shift(mu: float, sigma: float, t: jax.Array) -> jax.Array:
    """Flux exponential time shift (reference ``sampling.py:22-23``)."""
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def time_shift_linear(mu: float, t: jax.Array) -> jax.Array:
    """CogView4 linear time shift (reference ``sampling.py:27-31``)."""
    return mu / (mu + (1.0 / t - 1.0))


def sigmoid_randn(
    key: jax.Array, batch_size: int, sigmoid_scale: float = 1.0
) -> jax.Array:
    """t = sigmoid(N(0,1) * scale) (reference ``sampling.py:72-83``)."""
    norm_rand = jax.random.normal(key, (batch_size,), dtype=jnp.float32)
    return jax.nn.sigmoid(norm_rand * sigmoid_scale)


def shift_sigmoid_randn(
    key: jax.Array,
    batch_size: int,
    discrete_flow_shift: float = 3.1825,
    sigmoid_scale: float = 1.0,
) -> jax.Array:
    """Sigmoid sample followed by discrete-flow shift (reference ``sampling.py:52-69``)."""
    t = sigmoid_randn(key, batch_size, sigmoid_scale)
    shift = discrete_flow_shift
    return (t * shift) / (1.0 + (shift - 1.0) * t)


def flux_shift_randn(
    key: jax.Array,
    batch_size: int,
    height: int,
    width: int,
    sigmoid_scale: float = 1.0,
) -> jax.Array:
    """Resolution-dependent flux shift (reference ``sampling.py:35-48``).

    mu is estimated from the token count (height//2)*(width//2).
    """
    t = sigmoid_randn(key, batch_size, sigmoid_scale)
    mu = get_lin_function(y1=0.5, y2=1.15)((height // 2) * (width // 2))
    return time_shift(mu, 1.0, t)


def uniform_rand(key: jax.Array, batch_size: int) -> jax.Array:
    """t ~ U[0, 1) (reference ``sampling.py:86-94``)."""
    return jax.random.uniform(key, (batch_size,), dtype=jnp.float32)


def shift_uniform_rand(
    key: jax.Array, batch_size: int, shift: float = 6.0
) -> jax.Array:
    """Uniform then shift (reference ``sampling.py:97-106``)."""
    t = uniform_rand(key, batch_size)
    return (t * shift) / (1.0 + (shift - 1.0) * t)


def _create_fractions(denominators: Sequence[int]) -> np.ndarray:
    """Unique i/d grid over all denominators (reference ``sampling.py:110-123``)."""
    unique: set[float] = set()
    for d in denominators:
        for i in range(0, d + 1):
            unique.add(i / d)
    return np.array(sorted(unique), dtype=np.float32)


def fraction_uniform_rand(
    key: jax.Array,
    batch_size: int,
    divisible: Sequence[int] = tuple(range(20, 30)),
) -> jax.Array:
    """Sample t from the set of fractions i/d (reference ``sampling.py:127-147``)."""
    assert len(divisible) > 0, "divisible must not be empty"
    fractions = jnp.asarray(_create_fractions(divisible))
    idx = jax.random.randint(key, (batch_size,), 0, fractions.shape[0])
    return fractions[idx]


def shift_fraction_uniform_rand(
    key: jax.Array,
    batch_size: int,
    shift: float = 6.0,
    divisible: Sequence[int] = tuple(range(20, 30)),
) -> jax.Array:
    """Fraction-uniform then shift (reference ``sampling.py:150-162``)."""
    t = fraction_uniform_rand(key, batch_size, divisible)
    return (t * shift) / (1.0 + (shift - 1.0) * t)


def scale_shift_sigmoid_randn(
    key: jax.Array,
    batch_size: int,
    std: float = 0.8,
    mean: float = -0.8,
) -> jax.Array:
    """JiT default: t = sigmoid(N(mean, std)) (reference ``sampling.py:263-276``)."""
    norm_rand = jax.random.normal(key, (batch_size,), dtype=jnp.float32)
    return jax.nn.sigmoid(norm_rand * std + mean)


def sample_timestep(
    key: jax.Array,
    batch_size: int,
    sampling_type: TimestepSamplingType = "sigmoid",
    *,
    height: int | None = None,
    width: int | None = None,
    **kwargs,
) -> jax.Array:
    """Dispatcher matching reference ``sampling.py:170-187`` (plus the uniform
    variants it routes through other call sites)."""
    if sampling_type == "shift_sigmoid":
        return shift_sigmoid_randn(key, batch_size, **kwargs)
    if sampling_type == "flux_shift":
        assert height is not None and width is not None
        return flux_shift_randn(key, batch_size, height, width, **kwargs)
    if sampling_type == "sigmoid":
        return sigmoid_randn(key, batch_size, **kwargs)
    if sampling_type == "uniform":
        return uniform_rand(key, batch_size)
    if sampling_type == "shift_uniform":
        return shift_uniform_rand(key, batch_size, **kwargs)
    if sampling_type == "fraction_uniform":
        return fraction_uniform_rand(key, batch_size, **kwargs)
    if sampling_type == "shift_fraction_uniform":
        return shift_fraction_uniform_rand(key, batch_size, **kwargs)
    if sampling_type == "scale_shift_sigmoid":
        return scale_shift_sigmoid_randn(key, batch_size, **kwargs)
    raise ValueError(f"Invalid sampling type: {sampling_type}")


# MARK: discrete (DDPM)


def uniform_randint(
    key: jax.Array,
    batch_size: int,
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
) -> jax.Array:
    """t ~ U{min, ..., max-1} (reference ``sampling.py:191-207``)."""
    return jax.random.randint(
        key, (batch_size,), min_timesteps, max_timesteps, dtype=jnp.int32
    )


def gaussian_randint(
    key: jax.Array,
    batch_size: int,
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
    mean: float = 500.0,
    std: float = 500.0,
) -> jax.Array:
    """Gaussian-weighted categorical over integer timesteps
    (reference ``sampling.py:210-234``)."""
    idx = jnp.arange(min_timesteps, max_timesteps + 1, dtype=jnp.float32)
    logits = -0.5 * jnp.square((idx - mean) / std)
    draw = jax.random.categorical(key, logits, shape=(batch_size,))
    return (draw + min_timesteps).astype(jnp.int32)


def sigmoid_randint(
    key: jax.Array,
    batch_size: int,
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
    sigmoid_scale: float = 1.0,
) -> jax.Array:
    """Sigmoid-of-normal scaled to integer range (reference ``sampling.py:237-255``)."""
    t = sigmoid_randn(key, batch_size, sigmoid_scale)
    t = t * (max_timesteps - min_timesteps) + min_timesteps
    return jnp.round(t).astype(jnp.int32)
