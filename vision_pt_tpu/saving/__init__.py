from .strategy import ModelSavingStrategy, ModelSavingStrategyConfig
from .callbacks import (
    HFHubSavingCallbackConfig,
    ModelSavingCallback,
    ModelSavingCallbackConfig,
    SafetensorsSavingCallback,
    SafetensorsSavingCallbackConfig,
    get_saving_callback,
    ModelSavingCallbackConfigAlias,
)

__all__ = [
    "ModelSavingStrategy",
    "ModelSavingStrategyConfig",
    "ModelSavingCallback",
    "ModelSavingCallbackConfig",
    "SafetensorsSavingCallback",
    "SafetensorsSavingCallbackConfig",
    "HFHubSavingCallbackConfig",
    "get_saving_callback",
    "ModelSavingCallbackConfigAlias",
]
