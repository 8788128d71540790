from .config import (
    ClassContextConfig,
    DenoiserConfig,
    JiT_B_16_Config,
    JiTConfig,
    TextContextConfig,
)
from .denoiser import Denoiser, JiT
from .pipeline import JiTModel

__all__ = [
    "ClassContextConfig",
    "DenoiserConfig",
    "JiT_B_16_Config",
    "JiTConfig",
    "TextContextConfig",
    "Denoiser",
    "JiT",
    "JiTModel",
]
