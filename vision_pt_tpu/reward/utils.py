"""Reward-model interfaces (rebuild of reference
``src/modules/reward/utils.py``).

JAX-first change vs the reference: rewards take decoded IMAGE ARRAYS
(NHWC, [-1, 1]) and must be differentiable — the reference passes PIL
images, which is why its DRaFT+ gradient path was left unfinished
(``train/sdxl/draft_plus.py:236`` TODO). Here reward scores sit inside the
jitted loss so gradients flow back through the sampler's truncated tail.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, Literal

import jax
from flax import nnx
from pydantic import BaseModel


class FrozenRewardParam(nnx.Variable):
    """Reward-model weights re-tagged as a NON-Param variable type: judge
    weights are structurally untrainable — no optimizer ``wrt`` filter or
    grad ``DiffState`` selecting ``nnx.Param`` (or any subclass) can ever
    pick them up, matching the reference's frozen/no_grad PickScore
    (``src/modules/reward/pickscore.py:30-81``). Gradients still FLOW
    THROUGH the frozen weights to the images, which DRaFT+ needs."""


def freeze_reward_params(module: nnx.Module) -> int:
    """Re-tag every ``nnx.Param`` in the tree as ``FrozenRewardParam``.
    Returns the number of variables frozen."""
    from ..peft.functional import iter_named_modules

    n = 0
    for _, mod in iter_named_modules(module):
        for name, attr in list(vars(mod).items()):
            if isinstance(attr, nnx.Param):
                setattr(mod, name, FrozenRewardParam(attr.value))
                n += 1
    return n


class RewardModelMixin(ABC):
    @abstractmethod
    def __call__(self, images: jax.Array, prompts: list[str]) -> jax.Array:
        """images: (B, H, W, 3) in [-1, 1] -> scores (B,), differentiable."""


class RewardModelConfig(BaseModel, ABC):
    type: str

    @abstractmethod
    def load_model(self) -> RewardModelMixin:
        raise NotImplementedError


class CallableRewardModel(RewardModelMixin):
    """Wraps any differentiable (images, prompts) -> scores function."""

    def __init__(self, fn: Callable[[jax.Array, list[str]], jax.Array]):
        self._fn = fn

    def __call__(self, images: jax.Array, prompts: list[str]) -> jax.Array:
        return self._fn(images, prompts)


class BrightnessRewardConfig(RewardModelConfig):
    """Toy differentiable reward (useful for smoke tests and plumbing
    checks): mean image brightness."""

    type: Literal["brightness"] = "brightness"

    def load_model(self) -> RewardModelMixin:
        import jax.numpy as jnp

        return CallableRewardModel(
            lambda images, prompts: jnp.mean(images, axis=(1, 2, 3))
        )
