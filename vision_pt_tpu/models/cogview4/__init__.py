from .config import CogView4Config, DenoiserConfig
from .denoiser import CogView4DiT, Denoiser
from .pipeline import CogView4Model

__all__ = [
    "CogView4Config",
    "DenoiserConfig",
    "CogView4DiT",
    "Denoiser",
    "CogView4Model",
]
