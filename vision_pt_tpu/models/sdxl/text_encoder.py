"""SDXL dual CLIP text encoders, TPU-native (rebuild of reference
``src/models/sdxl/text_encoder.py``).

A from-scratch JAX CLIP text model with HF-transformers-compatible state paths
(``text_model.encoder.layers.N.self_attn.q_proj...``) replaces the torch
CLIPTextModel/CLIPTextModelWithProjection. The dual encoder reproduces the
reference's extraction exactly: CLIP-L penultimate hidden state, bigG
penultimate + projected pooled output of the FIRST chunk, long prompts chunked
to Nx75 with inner bos/eos stripped on re-concat.

Tokenizers are pluggable (HF CLIPTokenizer when its files are available
locally; tests inject token ids directly).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.long_prompt import tokenize_long_prompt
from ...utils import PromptType

CHUNK_LENGTH = 75


@dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    eos_token_id: int = 2


# openai/clip-vit-large-patch14 (reference ``text_encoder.py:25-48``)
TEXT_ENCODER_1_CONFIG = CLIPTextConfig()
# laion/CLIP-ViT-bigG-14 (reference ``text_encoder.py:52-77``)
TEXT_ENCODER_2_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    intermediate_size=5120,
    num_hidden_layers=32,
    num_attention_heads=20,
    hidden_act="gelu",
    projection_dim=1280,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nnx.Module):
    def __init__(self, config: CLIPTextConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = nnx.Linear(d, d, **kw)
        self.k_proj = nnx.Linear(d, d, **kw)
        self.v_proj = nnx.Linear(d, d, **kw)
        self.out_proj = nnx.Linear(d, d, **kw)

    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        b, s, d = x.shape
        q = self.q_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (self.head_dim**-0.5) + causal_mask[None, None]
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, d)
        return self.out_proj(out)


class CLIPMLP(nnx.Module):
    def __init__(self, config: CLIPTextConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc1 = nnx.Linear(config.hidden_size, config.intermediate_size, **kw)
        self.fc2 = nnx.Linear(config.intermediate_size, config.hidden_size, **kw)
        self.act = _act(config.hidden_act)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc2(self.act(self.fc1(x)))


class CLIPEncoderLayer(nnx.Module):
    def __init__(self, config: CLIPTextConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        eps = config.layer_norm_eps
        self.self_attn = CLIPAttention(config, **kw)
        self.layer_norm1 = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                         param_dtype=param_dtype, dtype=dtype,
                                         rngs=rngs)
        self.mlp = CLIPMLP(config, **kw)
        self.layer_norm2 = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                         param_dtype=param_dtype, dtype=dtype,
                                         rngs=rngs)

    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        x = x + self.self_attn(self.layer_norm1(x), causal_mask)
        return x + self.mlp(self.layer_norm2(x))


class CLIPTextEmbeddings(nnx.Module):
    def __init__(self, config: CLIPTextConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.token_embedding = nnx.Embed(config.vocab_size, config.hidden_size,
                                         param_dtype=param_dtype, dtype=dtype,
                                         rngs=rngs)
        self.position_embedding = nnx.Embed(
            config.max_position_embeddings, config.hidden_size,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs)

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        seq = input_ids.shape[1]
        pos = jnp.arange(seq)[None]
        return self.token_embedding(input_ids) + self.position_embedding(pos)


class CLIPTextModelOutput(NamedTuple):
    last_hidden_state: jax.Array
    penultimate_hidden_state: jax.Array
    pooler_output: jax.Array  # eos-token hidden (after final LN)
    text_embeds: jax.Array | None  # projected pooled (WithProjection only)


class TextModel(nnx.Module):
    """HF ``CLIPTextModel.text_model`` analog (embeddings + encoder +
    final_layer_norm)."""

    def __init__(self, config: CLIPTextConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.embeddings = CLIPTextEmbeddings(config, **kw)
        self.layers = nnx.List([
            CLIPEncoderLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.final_layer_norm = nnx.LayerNorm(
            config.hidden_size, epsilon=config.layer_norm_eps,
            param_dtype=param_dtype, dtype=dtype, rngs=rngs)


class CLIPTextModel(nnx.Module):
    """JAX CLIP text encoder; optional projection head (bigG)."""

    def __init__(self, config: CLIPTextConfig, with_projection: bool = False,
                 *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        self.text_model = TextModel(config, dtype=dtype,
                                    param_dtype=param_dtype, rngs=rngs)
        self.text_projection = (
            nnx.Linear(config.hidden_size, config.projection_dim,
                       use_bias=False, dtype=dtype, param_dtype=param_dtype,
                       rngs=rngs)
            if with_projection else None
        )

    def resize_token_embeddings(self, new_num_tokens: int) -> None:
        """Grow the vocab (HF analog); new rows init to the mean embedding."""
        emb = self.text_model.embeddings.token_embedding
        table = emb.embedding.value
        old = table.shape[0]
        if new_num_tokens <= old:
            return
        mean = table.mean(axis=0, keepdims=True)
        extra = jnp.tile(mean, (new_num_tokens - old, 1)).astype(table.dtype)
        emb.embedding.value = jnp.concatenate([table, extra], axis=0)
        if hasattr(emb, "num_embeddings"):
            emb.num_embeddings = new_num_tokens
        self.config.vocab_size = new_num_tokens

    def __call__(
        self,
        input_ids: jax.Array,
        style_embeddings: jax.Array | None = None,
        style_token_id: int | None = None,
    ) -> CLIPTextModelOutput:
        tm = self.text_model
        if style_embeddings is not None:
            # masked_scatter analog (reference style_tokenizer.py:82-111):
            # replace every style-token embedding, in flat scan order, by the
            # next row of style_embeddings. Static shapes: occurrence index
            # via cumsum, gather, select.
            assert style_token_id is not None
            tok = tm.embeddings.token_embedding(input_ids)
            hidden = tok.shape[-1]
            flat_mask = (input_ids == style_token_id).reshape(-1)
            flat_styles = style_embeddings.reshape(-1, hidden)
            occ = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
            gathered = flat_styles[
                jnp.clip(occ, 0, flat_styles.shape[0] - 1)
            ].astype(tok.dtype)
            flat_tok = jnp.where(
                flat_mask[:, None], gathered, tok.reshape(-1, hidden)
            )
            tok = flat_tok.reshape(tok.shape)
            pos = jnp.arange(input_ids.shape[1])[None]
            x = tok + tm.embeddings.position_embedding(pos)
        else:
            x = tm.embeddings(input_ids)
        seq = input_ids.shape[1]
        causal = jnp.triu(
            jnp.full((seq, seq), jnp.finfo(jnp.float32).min), k=1
        )
        penultimate = x
        for i, layer in enumerate(tm.layers):
            if i == len(tm.layers) - 1:
                penultimate = x
            x = layer(x, causal)
        last = tm.final_layer_norm(x)
        # pooled token position: HF CLIP keeps the legacy argmax(input_ids)
        # lookup when eos_token_id == 2 (the eot token is the highest id in
        # the real CLIP vocab, so argmax finds the first eot); otherwise the
        # first literal eos.
        eos = self.config.eos_token_id
        if eos == 2:
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax((input_ids == eos).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(last.shape[0]), eos_pos]
        text_embeds = (
            self.text_projection(pooled) if self.text_projection is not None
            else None
        )
        return CLIPTextModelOutput(
            last_hidden_state=last,
            penultimate_hidden_state=penultimate,
            pooler_output=pooled,
            text_embeds=text_embeds,
        )


# ------------------------------------------------------------- dual encoder


class TextEncodingOutput(NamedTuple):
    positive_embeddings: jax.Array
    positive_attention_mask: jax.Array
    negative_embeddings: jax.Array
    negative_attention_mask: jax.Array


class PooledTextEncodingOutput(NamedTuple):
    positive_embeddings: jax.Array
    pooled_positive_embeddings: jax.Array
    negative_embeddings: jax.Array
    pooled_negative_embeddings: jax.Array


class MultipleTextEncodingOutput(NamedTuple):
    text_encoder_1: TextEncodingOutput
    text_encoder_2: PooledTextEncodingOutput


def _merge_chunks(hidden: jax.Array, batch: int) -> jax.Array:
    """(batch*chunks, 77, d) -> (batch, 2 + 75*chunks, d): inner bos/eos
    stripped, first bos + last eos kept (reference
    ``text_encoder.py:217-243``)."""
    bc, seq, dim = hidden.shape
    chunks = hidden.reshape(batch, -1, seq, dim)
    inner = chunks[:, :, 1:-1, :].reshape(batch, -1, dim)
    first_bos = chunks[:, 0, 0, :][:, None]
    last_eos = chunks[:, -1, -1, :][:, None]
    return jnp.concatenate([first_bos, inner, last_eos], axis=1)


def _merge_mask(mask: np.ndarray, batch: int) -> np.ndarray:
    bc, seq = mask.shape
    chunks = mask.reshape(batch, -1, seq)
    inner = chunks[:, :, 1:-1].reshape(batch, -1)
    return np.concatenate(
        [chunks[:, 0, :1], inner, chunks[:, -1, -1:]], axis=1
    )


class TextEncoder:
    """Dual CLIP encoder (reference ``text_encoder.py:88-387``)."""

    def __init__(self, text_encoder_1: CLIPTextModel, tokenizer_1,
                 text_encoder_2: CLIPTextModel, tokenizer_2):
        self.text_encoder_1 = text_encoder_1
        self.tokenizer_1 = tokenizer_1
        self.text_encoder_2 = text_encoder_2
        self.tokenizer_2 = tokenizer_2

    @classmethod
    def from_default(cls, tokenizer_1=None, tokenizer_2=None, *,
                     dtype=None, param_dtype=jnp.float32,
                     rngs: nnx.Rngs | None = None) -> "TextEncoder":
        rngs = rngs or nnx.Rngs(0)
        te1 = CLIPTextModel(TEXT_ENCODER_1_CONFIG, with_projection=False,
                            dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        te2 = CLIPTextModel(TEXT_ENCODER_2_CONFIG, with_projection=True,
                            dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        return cls(te1, tokenizer_1, te2, tokenizer_2)

    @staticmethod
    def escape_exclamation(text: str) -> str:
        return text.replace("!", " !")

    def normalize_prompts(self, prompts: PromptType,
                          negative_prompts: PromptType | None = None,
                          use_negative_prompts: bool = True):
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
        _p = [self.escape_exclamation(t) for t in _p]
        _n = [self.escape_exclamation(t) for t in _n]
        return _p, _n

    def encode_prompts_text_encoder_1(
        self, prompts, negative_prompts=None, use_negative_prompts=False,
        max_token_length: int = CHUNK_LENGTH,
    ) -> TextEncodingOutput:
        _p, _n = self.normalize_prompts(prompts, negative_prompts,
                                        use_negative_prompts)
        num_pos = len(_p)
        all_prompts = _p + _n
        ids, mask = tokenize_long_prompt(
            self.tokenizer_1, all_prompts, max_length=max_token_length,
            chunk_length=CHUNK_LENGTH,
        )
        out = self.text_encoder_1(jnp.asarray(ids))
        merged = _merge_chunks(out.penultimate_hidden_state, len(all_prompts))
        merged_mask = jnp.asarray(_merge_mask(mask, len(all_prompts)))
        return TextEncodingOutput(
            positive_embeddings=merged[:num_pos],
            positive_attention_mask=merged_mask[:num_pos],
            negative_embeddings=merged[num_pos:],
            negative_attention_mask=merged_mask[num_pos:],
        )

    def encode_prompts_text_encoder_2(
        self, prompts, negative_prompts=None, use_negative_prompts=False,
        max_token_length: int = CHUNK_LENGTH,
    ) -> PooledTextEncodingOutput:
        _p, _n = self.normalize_prompts(prompts, negative_prompts,
                                        use_negative_prompts)
        num_pos = len(_p)
        all_prompts = _p + _n
        ids, _ = tokenize_long_prompt(
            self.tokenizer_2, all_prompts, max_length=max_token_length,
            chunk_length=CHUNK_LENGTH,
        )
        out = self.text_encoder_2(jnp.asarray(ids))
        merged = _merge_chunks(out.penultimate_hidden_state, len(all_prompts))
        # pooled: projected embeds of the FIRST chunk only
        # (reference ``text_encoder.py:339-347``)
        pooled = out.text_embeds.reshape(len(all_prompts), -1,
                                         out.text_embeds.shape[-1])[:, 0]
        return PooledTextEncodingOutput(
            positive_embeddings=merged[:num_pos],
            pooled_positive_embeddings=pooled[:num_pos],
            negative_embeddings=merged[num_pos:],
            pooled_negative_embeddings=pooled[num_pos:],
        )

    def encode_prompts(
        self, prompts, negative_prompts=None, use_negative_prompts=False,
        max_token_length: int = 75,
    ) -> MultipleTextEncodingOutput:
        return MultipleTextEncodingOutput(
            text_encoder_1=self.encode_prompts_text_encoder_1(
                prompts, negative_prompts, use_negative_prompts,
                max_token_length),
            text_encoder_2=self.encode_prompts_text_encoder_2(
                prompts, negative_prompts, use_negative_prompts,
                max_token_length),
        )
