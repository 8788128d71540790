"""LR schedule factory (rebuild of reference ``src/scheduler/util.py:9-39``
and ``src/scheduler/nothing.py``).

transformers scheduler names map to optax schedules returning a multiplicative
factor over the base lr; ``get_lr_schedule(base_lr, ...)`` returns an optax
schedule callable suitable for any optax optimizer's ``learning_rate``.
"""

from __future__ import annotations

import math
from typing import Callable

import optax

Schedule = Callable[[int], float]


def nothing_schedule(base_lr: float) -> Schedule:
    """No-op scheduler (reference ``src/scheduler/nothing.py:4-12``)."""
    return lambda step: base_lr


def get_lr_schedule(
    base_lr: float,
    name: str | None = None,
    args: dict | None = None,
    total_steps: int | None = None,
) -> Schedule:
    """transformers-compatible names first, optax names second, no-op default."""
    args = dict(args or {})
    if name is None or name in ("nothing", "NothingScheduler", "constant"):
        return nothing_schedule(base_lr)

    warmup = int(args.pop("num_warmup_steps", args.pop("warmup_steps", 0)))
    steps = int(
        args.pop("num_training_steps", args.pop("decay_steps", total_steps or 0))
    )

    key = name.lower()
    if key in ("constant_with_warmup",):
        return optax.schedules.warmup_constant_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup, 1)
        )
    if key in ("linear",):
        return _warmup_linear(base_lr, warmup, steps)
    if key in ("cosine",):
        return optax.schedules.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=max(warmup, 0),
            decay_steps=max(steps, 1),
        )
    if key in ("cosine_with_restarts",):
        cycles = args.pop("num_cycles", 1)
        return _warmup_cosine_restarts(base_lr, warmup, steps, cycles)
    if key in ("polynomial",):
        power = args.pop("power", 1.0)
        end = args.pop("lr_end", 1e-7)
        return optax.schedules.polynomial_schedule(
            init_value=base_lr,
            end_value=end,
            power=power,
            transition_steps=max(steps, 1),
            transition_begin=warmup,
        )
    # fall back to optax schedule constructors by name
    builder = getattr(optax.schedules, key, None) or getattr(optax, key, None)
    if builder is not None:
        return builder(**args)
    raise ValueError(f"Unknown scheduler: {name}")


def _warmup_linear(base_lr: float, warmup: int, total: int) -> Schedule:
    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.minimum(step / max(warmup, 1), 1.0)
        decay = jnp.maximum(
            (total - step) / max(total - warmup, 1), 0.0
        ) if total > 0 else 1.0
        return base_lr * jnp.where(step < warmup, warm, decay)

    return fn


def _warmup_cosine_restarts(
    base_lr: float, warmup: int, total: int, cycles: int
) -> Schedule:
    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / max(warmup, 1)
        progress = jnp.clip((step - warmup) / max(total - warmup, 1), 0.0, 1.0)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * ((cycles * progress) % 1.0)))
        )
        return base_lr * jnp.where(step < warmup, warm, cos)

    return fn
