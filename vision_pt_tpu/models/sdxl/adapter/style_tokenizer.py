"""SDXL + style tokenizer pipeline (rebuild of reference
``src/models/sdxl/adapter/style_tokenizer.py``).

A ``<|style|>`` placeholder is added to both CLIP tokenizers; a vision tower
+ per-encoder projectors produce embeddings that replace the placeholder's
token embeddings before the CLIP encoder stack runs (reference
``style_tokenizer.py:82-111`` masked_scatter).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ....adapters.style_tokenizer import (
    StyleTokenizerConfig,
    StyleTokenizerManager,
)
from ....data.transforms import PaddedResize
from ....ops.long_prompt import tokenize_long_prompt
from ...auto import AutoImageEncoder
from ..config import SDXLConfig
from ..pipeline import SDXLModel
from ..text_encoder import (
    CHUNK_LENGTH,
    MultipleTextEncodingOutput,
    PooledTextEncodingOutput,
    TextEncoder,
    TextEncodingOutput,
    _merge_chunks,
    _merge_mask,
)


class SDXLModelWithStyleTokenizerConfig(SDXLConfig):
    adapter: StyleTokenizerConfig = StyleTokenizerConfig()


class TextEncoderWithStyle(TextEncoder):
    """Reference ``style_tokenizer.py:43-402``."""

    style_token: str = "<|style|>"
    num_style_tokens: int = 4
    style_token_id_1: int | None = None
    style_token_id_2: int | None = None

    def append_style_token_id(self, style_token: str = "<|style|>",
                              num_style_tokens: int = 4):
        self.style_token = style_token
        self.num_style_tokens = num_style_tokens
        self.tokenizer_1.add_tokens(style_token, special_tokens=True)
        self.tokenizer_2.add_tokens(style_token, special_tokens=True)
        self.style_token_id_1 = self.tokenizer_1.convert_tokens_to_ids(
            style_token
        )
        self.style_token_id_2 = self.tokenizer_2.convert_tokens_to_ids(
            style_token
        )
        self.text_encoder_1.resize_token_embeddings(len(self.tokenizer_1))
        self.text_encoder_2.resize_token_embeddings(len(self.tokenizer_2))

    def preprocess_style_token(self, prompts):
        """Expand the placeholder to N copies (reference
        ``style_tokenizer.py:67-80``)."""
        if isinstance(prompts, str):
            return prompts.replace(
                self.style_token, self.style_token * self.num_style_tokens
            )
        if isinstance(prompts, list):
            return [
                p.replace(self.style_token,
                          self.style_token * self.num_style_tokens)
                for p in prompts
            ]
        return prompts

    @staticmethod
    def _batch_styles(style_embeddings, negative_style_embeddings,
                      use_negative_prompts):
        if style_embeddings is None:
            return None
        if negative_style_embeddings is None:
            negative_style_embeddings = jnp.zeros_like(style_embeddings)
        if use_negative_prompts:
            return jnp.concatenate(
                [style_embeddings, negative_style_embeddings], axis=0
            )
        return style_embeddings

    def encode_prompts_text_encoder_1(
        self, prompts, negative_prompts=None, use_negative_prompts=False,
        max_token_length: int = CHUNK_LENGTH, style_embeddings=None,
        negative_style_embeddings=None,
    ) -> TextEncodingOutput:
        # the placeholder expands for encoder 1 only (reference asymmetry:
        # style_tokenizer.py:122-127 vs :243-248)
        _p, _n = self.normalize_prompts(
            self.preprocess_style_token(prompts),
            self.preprocess_style_token(negative_prompts)
            if negative_prompts is not None else None,
            use_negative_prompts,
        )
        num_pos = len(_p)
        all_prompts = _p + _n
        ids, mask = tokenize_long_prompt(
            self.tokenizer_1, all_prompts, max_length=max_token_length,
            chunk_length=CHUNK_LENGTH,
        )
        styles = self._batch_styles(
            style_embeddings, negative_style_embeddings, use_negative_prompts
        )
        out = self.text_encoder_1(
            jnp.asarray(ids), style_embeddings=styles,
            style_token_id=self.style_token_id_1,
        )
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
        max_token_length: int = CHUNK_LENGTH, style_embeddings=None,
        negative_style_embeddings=None,
    ) -> PooledTextEncodingOutput:
        _p, _n = self.normalize_prompts(prompts, negative_prompts,
                                        use_negative_prompts)
        num_pos = len(_p)
        all_prompts = _p + _n
        ids, _ = tokenize_long_prompt(
            self.tokenizer_2, all_prompts, max_length=max_token_length,
            chunk_length=CHUNK_LENGTH,
        )
        styles = self._batch_styles(
            style_embeddings, negative_style_embeddings, use_negative_prompts
        )
        out = self.text_encoder_2(
            jnp.asarray(ids), style_embeddings=styles,
            style_token_id=self.style_token_id_2,
        )
        merged = _merge_chunks(out.penultimate_hidden_state, len(all_prompts))
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
        max_token_length: int = 75, style_tokens_1=None, style_tokens_2=None,
        negative_style_tokens_1=None, negative_style_tokens_2=None,
    ) -> MultipleTextEncodingOutput:
        return MultipleTextEncodingOutput(
            text_encoder_1=self.encode_prompts_text_encoder_1(
                prompts, negative_prompts, use_negative_prompts,
                max_token_length, style_tokens_1, negative_style_tokens_1,
            ),
            text_encoder_2=self.encode_prompts_text_encoder_2(
                prompts, negative_prompts, use_negative_prompts,
                max_token_length, style_tokens_2, negative_style_tokens_2,
            ),
        )


class ReferenceEncodeOutput:
    def __init__(self, style_tokens_1, style_tokens_2):
        self.style_tokens_1 = style_tokens_1
        self.style_tokens_2 = style_tokens_2


class SDXLModelWithStyleTokenizer(SDXLModel):
    """Reference ``style_tokenizer.py:410-712``."""

    config: SDXLModelWithStyleTokenizerConfig
    text_encoder_class = TextEncoderWithStyle

    def __init__(self, config: SDXLModelWithStyleTokenizerConfig, *,
                 rngs: nnx.Rngs | None = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, rngs=rngs, **kw)
        adapter_cfg = config.adapter
        self.manager = StyleTokenizerManager(adapter_config=adapter_cfg)
        self.manager.apply_adapter(self)
        self.vision_encoder = AutoImageEncoder(config=adapter_cfg.image_encoder)
        self.projector_1 = self.manager.get_projector(
            out_features=self.text_encoder.text_encoder_1.config.hidden_size,
            rngs=rngs,
        )
        self.projector_2 = self.manager.get_projector(
            out_features=self.text_encoder.text_encoder_2.config.hidden_size,
            rngs=rngs,
        )
        self._resize = PaddedResize(
            max_size=adapter_cfg.image_size, fill=adapter_cfg.background_color
        )
        self._mean = np.asarray(adapter_cfg.image_mean, dtype=np.float32)
        self._std = np.asarray(adapter_cfg.image_std, dtype=np.float32)

    def setup_style_token(self):
        """Add the placeholder to both tokenizers + grow the vocab."""
        self.text_encoder.append_style_token_id(
            style_token=self.config.adapter.style_token,
            num_style_tokens=self.config.adapter.num_style_tokens,
        )

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        super()._load_checkpoint(checkpoint_path, strict=strict)
        self.setup_style_token()
        if self.config.adapter.checkpoint_weight:
            from safetensors.numpy import load_file

            self.manager.load_adapter_state(
                load_file(self.config.adapter.checkpoint_weight)
            )

    def adapter_state_dict(self) -> dict[str, np.ndarray]:
        return self.manager.get_state_dict()

    # ---------------------------------------------------------- images

    def preprocess_reference_image(self, images) -> jax.Array:
        if isinstance(images, Image.Image):
            images = [images]
        if isinstance(images, (jax.Array, np.ndarray)):
            arr = np.asarray(images, dtype=np.float32)
            if arr.ndim == 3:
                arr = arr[None]
            if arr.min() < -0.01:
                arr = (arr + 1.0) / 2.0
            return jnp.asarray((arr - self._mean) / self._std)
        arrays = []
        for img in images:
            padded = self._resize(img.convert("RGB"))
            a = np.asarray(padded, dtype=np.float32) / 255.0
            arrays.append((a - self._mean) / self._std)
        return jnp.asarray(np.stack(arrays))

    def encode_reference_image(
        self, pixel_values: jax.Array
    ) -> ReferenceEncodeOutput:
        features = self.vision_encoder(pixel_values)
        return ReferenceEncodeOutput(
            style_tokens_1=self.projector_1(features).style_tokens,
            style_tokens_2=self.projector_2(features).style_tokens,
        )

    # ---------------------------------------------------------- generate

    def generate(self, prompt, *args, reference_image=None, **kwargs):
        style_tokens_1 = style_tokens_2 = None
        if reference_image is not None:
            pixels = (
                reference_image if isinstance(reference_image, jax.Array)
                else self.preprocess_reference_image(reference_image)
            )
            ref_out = self.encode_reference_image(pixels)
            style_tokens_1 = ref_out.style_tokens_1
            style_tokens_2 = ref_out.style_tokens_2
        return super().generate(
            prompt, *args,
            _encode_prompts_kwargs={
                "style_tokens_1": style_tokens_1,
                "style_tokens_2": style_tokens_2,
            },
            **kwargs,
        )
