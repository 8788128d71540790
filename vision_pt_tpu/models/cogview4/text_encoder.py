"""GLM-4 text conditioning encoder for CogView4 (rebuild of reference
``src/models/cogview4/text_encoder.py``).

Uses the shared JAX decoder-LM module (``models/lm``) with the GLM-4-9B text
config; penultimate hidden state, left-padded to a multiple of 16 like the
reference. Needs local weights (no network egress here); tokenizer is
pluggable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import PromptType
from ..lm.model import DecoderLM, DecoderLMConfig

DEFAULT_MAX_TOKEN_LENGTH = 1024
DEFAULT_TOKENIZER_REPO = "THUDM/CogView4-6B"

# glm-4 text tower (reference ``text_encoder.py:14-36``)
GLM4_CONFIG = DecoderLMConfig(
    vocab_size=151552,
    hidden_size=4096,
    intermediate_size=13696,
    num_hidden_layers=40,
    num_attention_heads=32,
    num_key_value_heads=2,
    head_dim=128,
    rms_norm_eps=1.5625e-07,
    rope_theta=10000.0,
    partial_rotary_factor=0.5,
    attention_bias=True,
    hidden_act="silu",
    arch="glm",
)


class TextEncodingOutput(NamedTuple):
    positive_embeddings: jax.Array
    positive_attention_mask: jax.Array
    negative_embeddings: jax.Array
    negative_attention_mask: jax.Array


class TextEncoder:
    def __init__(self, model: DecoderLM, tokenizer, pad_token_id: int = 151329):
        self.model = model
        self.tokenizer = tokenizer
        self.pad_token_id = (
            getattr(tokenizer, "pad_token_id", None) or pad_token_id
        )

    @classmethod
    def from_default(cls, tokenizer=None, *, dtype=None, rngs=None) -> "TextEncoder":
        from flax import nnx

        model = DecoderLM(
            GLM4_CONFIG, dtype=dtype, rngs=rngs or nnx.Rngs(0)
        )
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
        if self.tokenizer is None:
            raise RuntimeError(
                "CogView4 text encoding needs a GLM tokenizer with local files "
                f"(repo: {DEFAULT_TOKENIZER_REPO}); this environment has no "
                "network egress. Inject one via TextEncoder(model, tokenizer)."
            )
        _p, _n = self.normalize_prompts(prompts, negative_prompts,
                                        use_negative_prompts)
        num_pos = len(_p)
        enc = self.tokenizer(
            _p + _n, max_length=max_token_length, padding="longest",
            truncation=True, add_special_tokens=True,
        )
        input_ids = np.asarray(
            enc["input_ids"] if isinstance(enc, dict) else enc.input_ids
        )
        # left-pad to a multiple of 16 (reference ``text_encoder.py:118-135``)
        pad = (-input_ids.shape[1]) % 16
        if pad:
            input_ids = np.concatenate(
                [
                    np.full((input_ids.shape[0], pad), self.pad_token_id,
                            dtype=input_ids.dtype),
                    input_ids,
                ],
                axis=1,
            )
        out = self.model(jnp.asarray(input_ids))
        hidden = out.penultimate_hidden_state
        ones = jnp.ones(input_ids.shape, dtype=jnp.int32)
        return TextEncodingOutput(
            positive_embeddings=hidden[:num_pos],
            positive_attention_mask=ones[:num_pos],
            negative_embeddings=hidden[num_pos:],
            negative_attention_mask=ones[num_pos:],
        )
