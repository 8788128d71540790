"""PickScore reward (rebuild of reference
``src/modules/reward/pickscore.py``).

PickScore is a CLIP-H scorer (yuvalkirstain/PickScore_v1). This environment
has no network egress, so the CLIP tower cannot be downloaded; the config is
kept API-compatible and the model is gated behind an injected
``score_fn(images, prompts) -> scores`` (differentiable JAX), mirroring
AutoImageEncoder's encode_fn injection.
"""

from __future__ import annotations

from typing import Callable, Literal

import jax

from .utils import RewardModelConfig, RewardModelMixin


class PickScoreConfig(RewardModelConfig):
    type: Literal["pickscore"] = "pickscore"
    model_id: str = "yuvalkirstain/PickScore_v1"
    weights_path: str | None = None

    def load_model(self) -> "PickScoreRewardModel":
        return PickScoreRewardModel(model_id=self.model_id,
                                    weights_path=self.weights_path)


class PickScoreRewardModel(RewardModelMixin):
    def __init__(self, model_id: str = "yuvalkirstain/PickScore_v1",
                 weights_path: str | None = None,
                 score_fn: Callable | None = None):
        self.model_id = model_id
        self.weights_path = weights_path
        self._score_fn = score_fn

    def set_score_fn(self, fn: Callable):
        self._score_fn = fn

    def __call__(self, images: jax.Array, prompts: list[str]) -> jax.Array:
        if self._score_fn is None:
            if self.weights_path:
                raise NotImplementedError(
                    "local PickScore CLIP-H loading is tracked for a later "
                    "round"
                )
            raise RuntimeError(
                f"PickScore needs pretrained CLIP weights ({self.model_id}); "
                "this environment has no network egress. Provide "
                "weights_path or inject score_fn."
            )
        return self._score_fn(images, prompts)
