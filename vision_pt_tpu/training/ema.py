"""Exponential moving average of model parameters.

TPU-native replacement for the reference's ``torch.optim.swa_utils.
AveragedModel`` usage (``src/trainer/common.py:211-218``): the EMA is a plain
param pytree updated inside the jitted train step (no module copy), exported
with the reference's ``ema_`` checkpoint prefix convention
(``src/trainer/common.py:160-164``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def init_ema(model: nnx.Module) -> nnx.State:
    """Snapshot current params as the EMA state. Copies the buffers: the
    train step donates both the param and EMA trees, and aliased leaves
    would be donated twice."""
    return jax.tree.map(lambda x: jnp.copy(x), nnx.state(model, nnx.Param))


def update_ema(ema: nnx.State, model: nnx.Module, decay: float) -> nnx.State:
    """ema <- decay * ema + (1-decay) * params."""
    params = nnx.state(model, nnx.Param)
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )


def swap_in_ema_params(model: nnx.Module, ema: nnx.State) -> nnx.State:
    """Install EMA params into the model, returning the originals."""
    original = nnx.state(model, nnx.Param)
    nnx.update(model, ema)
    return original
