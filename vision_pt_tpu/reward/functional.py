"""Reward model loading (rebuild of reference
``src/modules/reward/functional.py``)."""

from __future__ import annotations

from .pickscore import PickScoreConfig
from .utils import BrightnessRewardConfig, RewardModelConfig, RewardModelMixin

_REWARD_CONFIGS = {
    "pickscore": PickScoreConfig,
    "brightness": BrightnessRewardConfig,
}


def resolve_reward_config(config) -> RewardModelConfig:
    if isinstance(config, RewardModelConfig):
        return config
    return _REWARD_CONFIGS[config["type"]].model_validate(config)


def load_reward_models(configs) -> list[RewardModelMixin]:
    return [resolve_reward_config(c).load_model() for c in configs]
