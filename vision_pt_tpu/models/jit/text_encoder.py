"""Qwen3 text conditioning encoder interface (reference
``src/models/jit/text_encoder.py``).

The reference wraps ``p1atdev/Qwen3-VL-2B-Instruct-Text-Only`` (transformers,
CUDA) and takes the penultimate hidden state. The TPU build runs the encoder
as a JAX module loaded from local safetensors; when no local checkpoint is
available (this environment has no network egress) construction raises with
instructions rather than silently degrading.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from ...utils import PromptType

DEFAULT_REPO = "p1atdev/Qwen3-VL-2B-Instruct-Text-Only"


class TextEncodingOutput(NamedTuple):
    positive_embeddings: jax.Array
    positive_attention_mask: jax.Array
    negative_embeddings: jax.Array | None
    negative_attention_mask: jax.Array | None


class TextEncoder:
    """Penultimate-hidden-state text encoder (reference
    ``text_encoder.py:47-151``). Requires local weights."""

    def __init__(self, model, tokenizer):
        self.model = model
        self.tokenizer = tokenizer

    @classmethod
    def from_default(cls) -> "TextEncoder":
        return cls.from_remote(DEFAULT_REPO)

    @classmethod
    def from_remote(cls, repo_id: str = DEFAULT_REPO) -> "TextEncoder":
        raise NotImplementedError(
            "Text-conditioned JiT needs the Qwen3 encoder weights available "
            f"locally (repo: {repo_id}). Download them to disk and use "
            "TextEncoder.from_local(path); this environment has no network "
            "egress. Class-conditioned JiT (ClassContextConfig) is fully "
            "supported."
        )

    @classmethod
    def from_local(cls, path: str) -> "TextEncoder":
        raise NotImplementedError(
            "JAX Qwen3 text encoder loading is not implemented yet; "
            "tracked for a later round."
        )

    def encode_prompts(
        self,
        prompts: PromptType,
        negative_prompts: PromptType | None = None,
        use_negative_prompts: bool = False,
        max_token_length: int = 64,
    ) -> TextEncodingOutput:
        raise NotImplementedError
