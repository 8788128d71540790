from .config import DenoiserConfig, SDXLConfig
from .denoiser import Denoiser, UNet
from .pipeline import SDXLModel
from .scheduler import Scheduler
from .text_encoder import CLIPTextModel, TextEncoder
from .vae import VAE

__all__ = [
    "DenoiserConfig",
    "SDXLConfig",
    "Denoiser",
    "UNet",
    "SDXLModel",
    "Scheduler",
    "CLIPTextModel",
    "TextEncoder",
    "VAE",
]
