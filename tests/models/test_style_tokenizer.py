"""Style tokenizer adapter tests (reference
``src/models/sdxl/adapter/style_tokenizer.py``; its support module is missing
upstream — this validates our working rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.adapters.style_tokenizer import (
    StyleTokenizerConfig,
    StyleTokenizerManager,
)
from vision_pt_tpu.models.sdxl.adapter.style_tokenizer import (
    TextEncoderWithStyle,
)
from vision_pt_tpu.models.sdxl.text_encoder import (
    CLIPTextConfig,
    CLIPTextModel,
)

from tests.models.test_sdxl import MockTokenizer

pytestmark = pytest.mark.slow


class StyleMockTokenizer(MockTokenizer):
    def __init__(self, vocab_size: int = 1000):
        super().__init__(vocab_size)
        self.added: dict[str, int] = {}

    def add_tokens(self, token: str, special_tokens: bool = True):
        if token not in self.added:
            self.added[token] = self.vocab_size
            self.vocab_size += 1

    def convert_tokens_to_ids(self, token: str) -> int:
        return self.added[token]

    def __len__(self) -> int:
        return self.vocab_size

    def __call__(self, prompts, padding, truncation, max_length):
        out = []
        for text in prompts:
            for tok in self.added:
                text = text.replace(tok, f" {tok} ")
            ids = [self.bos_token_id]
            for w in text.split():
                if w in self.added:
                    ids.append(self.added[w])
                else:
                    ids.append(3 + (hash(w) % 900))
            ids = ids[: max_length - 1] + [self.eos_token_id]
            ids += [self.pad_token_id] * (max_length - len(ids))
            out.append(ids)
        return {"input_ids": out}


def _tiny_clip(vocab=1000, hidden=16, with_projection=False):
    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        projection_dim=24 if with_projection else 512,
    )
    return CLIPTextModel(cfg, with_projection=with_projection,
                         rngs=nnx.Rngs(0))


def test_resize_token_embeddings():
    model = _tiny_clip()
    old = model.text_model.embeddings.token_embedding.embedding.value
    model.resize_token_embeddings(1002)
    new = model.text_model.embeddings.token_embedding.embedding.value
    assert new.shape == (1002, 16)
    np.testing.assert_allclose(np.asarray(new[:1000]), np.asarray(old))
    np.testing.assert_allclose(
        np.asarray(new[1000]), np.asarray(old.mean(axis=0)), atol=1e-6
    )


def test_style_embedding_substitution():
    model = _tiny_clip()
    model.resize_token_embeddings(1001)
    style_id = 1000
    ids = jnp.asarray([[0, 5, style_id, style_id, 7, 2, 1, 1]])

    base = model(ids)
    styles = jax.random.normal(jax.random.key(0), (1, 2, 16))
    styled = model(ids, style_embeddings=styles, style_token_id=style_id)
    assert float(jnp.abs(
        styled.last_hidden_state - base.last_hidden_state
    ).max()) > 1e-4

    # substituting the actual embedding rows is a no-op
    table = model.text_model.embeddings.token_embedding.embedding.value
    identity_styles = jnp.stack([table[style_id], table[style_id]])[None]
    same = model(ids, style_embeddings=identity_styles,
                 style_token_id=style_id)
    np.testing.assert_allclose(
        np.asarray(same.last_hidden_state),
        np.asarray(base.last_hidden_state), atol=1e-5,
    )


def test_text_encoder_with_style_encode_prompts():
    te = TextEncoderWithStyle(
        _tiny_clip(hidden=16), StyleMockTokenizer(),
        _tiny_clip(hidden=24, with_projection=True), StyleMockTokenizer(),
    )
    te.append_style_token_id("<|style|>", num_style_tokens=3)
    assert te.style_token_id_1 == 1000
    assert te.text_encoder_1.config.vocab_size == 1001

    # expansion: one placeholder -> three consecutive style ids (encoder 1)
    expanded = te.preprocess_style_token("a <|style|> photo")
    assert expanded.count("<|style|>") == 3

    styles_1 = jax.random.normal(jax.random.key(1), (1, 3, 16))
    styles_2 = jax.random.normal(jax.random.key(2), (1, 3, 24))
    out = te.encode_prompts(
        ["a <|style|> photo"], negative_prompts=[""],
        use_negative_prompts=True, max_token_length=75,
        style_tokens_1=styles_1, style_tokens_2=styles_2,
    )
    assert out.text_encoder_1.positive_embeddings.shape == (1, 77, 16)
    assert out.text_encoder_2.pooled_positive_embeddings.shape == (1, 24)

    # style embeddings actually change the output
    out_zero = te.encode_prompts(
        ["a <|style|> photo"], negative_prompts=[""],
        use_negative_prompts=True, max_token_length=75,
        style_tokens_1=jnp.zeros_like(styles_1),
        style_tokens_2=jnp.zeros_like(styles_2),
    )
    assert float(jnp.abs(
        out.text_encoder_1.positive_embeddings
        - out_zero.text_encoder_1.positive_embeddings
    ).max()) > 1e-4


def test_manager_projectors_and_state():
    cfg = StyleTokenizerConfig(
        image_encoder={"feature_dim": 8}, num_style_tokens=4
    )
    manager = StyleTokenizerManager(cfg)
    p1 = manager.get_projector(out_features=16, rngs=nnx.Rngs(0))
    p2 = manager.get_projector(out_features=24, rngs=nnx.Rngs(1))
    feats = jax.random.normal(jax.random.key(0), (2, 8))
    assert p1(feats).style_tokens.shape == (2, 4, 16)
    assert p2(feats).style_tokens.shape == (2, 4, 24)

    sd = manager.get_state_dict()
    assert any(k.startswith("projector_1.") for k in sd)
    assert any(k.startswith("projector_2.") for k in sd)

    manager2 = StyleTokenizerManager(cfg)
    manager2.get_projector(out_features=16, rngs=nnx.Rngs(5))
    manager2.get_projector(out_features=24, rngs=nnx.Rngs(6))
    manager2.load_adapter_state(sd)
    sd2 = manager2.get_state_dict()
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-6)
