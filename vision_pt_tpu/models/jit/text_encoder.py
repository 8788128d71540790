"""Qwen3 text conditioning encoder (rebuild of reference
``src/models/jit/text_encoder.py``).

The reference wraps ``p1atdev/Qwen3-VL-2B-Instruct-Text-Only`` (transformers,
CUDA) and takes the penultimate hidden state. Here the encoder is the shared
JAX :class:`~vision_pt_tpu.models.lm.model.DecoderLM` (arch="qwen3"); for
text-only inputs Qwen3-VL's mrope collapses to standard rotate-half RoPE
(all three position streams are equal), so the decoder-LM path is exact.

Weights must be local (this environment has no network egress):
``TextEncoder.from_local(dir)`` with config.json + *.safetensors +
tokenizer files. ``from_remote`` raises with instructions.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import PromptType
from ..lm.model import DecoderLM, DecoderLMConfig

DEFAULT_REPO = "p1atdev/Qwen3-VL-2B-Instruct-Text-Only"
DEFAULT_MAX_TOKEN_LENGTH = 128

# reference text_encoder.py:14-41 (Qwen3-VL-2B text tower)
QWEN3_VL_2B_TEXT_CONFIG = DecoderLMConfig(
    vocab_size=151936,
    hidden_size=2048,
    intermediate_size=6144,
    num_hidden_layers=28,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=128,
    rms_norm_eps=1e-6,
    rope_theta=5_000_000.0,
    attention_bias=False,
    arch="qwen3",
)


class TextEncodingOutput(NamedTuple):
    positive_embeddings: jax.Array
    positive_attention_mask: jax.Array
    negative_embeddings: jax.Array | None
    negative_attention_mask: jax.Array | None


def _config_from_hf(hf: dict) -> DecoderLMConfig:
    return DecoderLMConfig(
        vocab_size=hf.get("vocab_size", 151936),
        hidden_size=hf.get("hidden_size", 2048),
        intermediate_size=hf.get("intermediate_size", 6144),
        num_hidden_layers=hf.get("num_hidden_layers", 28),
        num_attention_heads=hf.get("num_attention_heads", 16),
        num_key_value_heads=hf.get("num_key_value_heads", 8),
        head_dim=hf.get("head_dim", 128),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 5_000_000.0),
        attention_bias=hf.get("attention_bias", False),
        arch="qwen3",
    )


class TextEncoder:
    """Penultimate-hidden-state text encoder (reference
    ``text_encoder.py:50-151``)."""

    def __init__(self, model: DecoderLM, tokenizer):
        self.model = model
        self.tokenizer = tokenizer

    @classmethod
    def from_default(cls, tokenizer=None, *, dtype=None,
                     rngs=None) -> "TextEncoder":
        """Random-init Qwen3-VL-2B-text architecture (reference
        ``from_default``; useful for shape tests — real use needs weights)."""
        from flax import nnx

        model = DecoderLM(QWEN3_VL_2B_TEXT_CONFIG, dtype=dtype,
                          rngs=rngs or nnx.Rngs(0))
        return cls(model, tokenizer)

    @classmethod
    def from_remote(cls, repo_id: str = DEFAULT_REPO) -> "TextEncoder":
        raise NotImplementedError(
            "Text-conditioned JiT needs the Qwen3 encoder weights available "
            f"locally (repo: {repo_id}); this environment has no network "
            "egress. Download config.json + safetensors + tokenizer to a "
            "directory and use TextEncoder.from_local(path). "
            "Class-conditioned JiT (ClassContextConfig) needs no weights."
        )

    @classmethod
    def from_local(cls, path: str, *, dtype=None, rngs=None) -> "TextEncoder":
        """Load from a local HF-style directory (config.json +
        *.safetensors [+ tokenizer files])."""
        from flax import nnx
        from safetensors.numpy import load_file

        from ...utils.state_dict import load_flat_state

        d = Path(path)
        hf_cfg = json.loads((d / "config.json").read_text())
        # Qwen3-VL nests the text tower config under "text_config"
        hf_cfg = hf_cfg.get("text_config", hf_cfg)
        config = _config_from_hf(hf_cfg)
        model = DecoderLM(config, dtype=dtype, rngs=rngs or nnx.Rngs(0))

        sd: dict[str, np.ndarray] = {}
        for f in sorted(d.glob("*.safetensors")):
            sd |= load_file(str(f))
        # strip HF prefixes; DecoderLM uses HF-compatible paths
        sd = {
            k.removeprefix("model.language_model.")
            .removeprefix("language_model.")
            .removeprefix("model."): v
            for k, v in sd.items()
        }
        from ..sdxl.pipeline import _embed_fix

        sd = _embed_fix(
            {
                (k[:-len(".weight")] + ".kernel" if k.endswith(".weight")
                 and np.asarray(v).ndim == 2
                 and "embed_tokens" not in k else k): (
                    np.asarray(v).T if k.endswith(".weight")
                    and np.asarray(v).ndim == 2
                    and "embed_tokens" not in k else np.asarray(v)
                )
                for k, v in sd.items()
            }
        )
        load_flat_state(model, sd, strict=False)

        tokenizer = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(str(d))
        except Exception:
            pass
        return cls(model, tokenizer)

    def normalize_prompts(self, prompts, negative_prompts=None,
                          use_negative_prompts=True):
        _p = prompts if isinstance(prompts, list) else [prompts]
        if use_negative_prompts:
            if negative_prompts is not None:
                _n = (negative_prompts if isinstance(negative_prompts, list)
                      else [negative_prompts])
                if len(_n) == 1 and len(_p) > 1:
                    _n = _n * len(_p)
            else:
                _n = [""] * len(_p)
        else:
            _n = []
        return _p, _n

    def encode_prompts(
        self,
        prompts: PromptType,
        negative_prompts: PromptType | None = None,
        use_negative_prompts: bool = False,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ) -> TextEncodingOutput:
        """Reference ``text_encoder.py:105-151``: positives and negatives in
        ONE forward, penultimate hidden state out."""
        if self.tokenizer is None:
            raise RuntimeError(
                "JiT text encoding needs a Qwen tokenizer with local files "
                f"(repo: {DEFAULT_REPO}); inject one via "
                "TextEncoder(model, tokenizer)."
            )
        _p, _n = self.normalize_prompts(prompts, negative_prompts,
                                        use_negative_prompts)
        num_pos = len(_p)
        enc = self.tokenizer(
            _p + _n, max_length=max_token_length, padding="longest",
            truncation=True, add_special_tokens=True,
        )
        ids = np.asarray(enc["input_ids"] if isinstance(enc, dict)
                         else enc.input_ids)
        out = self.model(jnp.asarray(ids))
        hidden = out.penultimate_hidden_state
        ones = jnp.ones_like(jnp.asarray(ids))
        return TextEncodingOutput(
            positive_embeddings=hidden[:num_pos],
            positive_attention_mask=ones[:num_pos],
            negative_embeddings=hidden[num_pos:] if _n else None,
            negative_attention_mask=ones[num_pos:] if _n else None,
        )
