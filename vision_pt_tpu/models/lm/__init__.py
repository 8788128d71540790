from .model import DecoderLM, DecoderLMConfig

__all__ = ["DecoderLM", "DecoderLMConfig"]
