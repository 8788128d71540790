from .strategy import PreviewStrategy, PreviewStrategyConfig
from .callbacks import (
    DiscordPreviewCallbackConfig,
    LocalPreviewCallback,
    LocalPreviewCallbackConfig,
    PreviewCallback,
    PreviewCallbackConfigAlias,
    get_preview_callback,
)

__all__ = [
    "PreviewStrategy",
    "PreviewStrategyConfig",
    "PreviewCallback",
    "LocalPreviewCallback",
    "LocalPreviewCallbackConfig",
    "DiscordPreviewCallbackConfig",
    "PreviewCallbackConfigAlias",
    "get_preview_callback",
]
