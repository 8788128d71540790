"""PickScore reward (rebuild of reference
``src/modules/reward/pickscore.py:30-81``).

PickScore is a CLIP-H scorer (yuvalkirstain/PickScore_v1). Both towers are
the repo's native JAX CLIP implementations (``models/clip_vision.py`` vision
tower, ``models/sdxl/text_encoder.py`` text tower) with projection heads and
a learned logit scale, loaded from a local HF directory — no egress.

JAX-first change vs the reference: scoring takes image ARRAYS and is
differentiable end-to-end (preprocessing — bicubic resize + CLIP
normalization — happens in-graph), so DRaFT+ backpropagates the reward
through the sampler tail. The reference scores PIL images under
``torch.no_grad`` and its reward-gradient step was left as a TODO.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .utils import (
    FrozenRewardParam,
    RewardModelConfig,
    RewardModelMixin,
    freeze_reward_params,
)

# CLIP image preprocessing constants (openai/CLIP processor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def convert_hf_clip_text(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """HF torch-layout CLIP text state dict -> NNX flat dict (mirror of
    ``models/clip_vision.py`` ``convert_hf_clip_vision``)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        k = k.removeprefix("clip.")
        if not (k.startswith("text_model.") or k.startswith("text_projection")):
            continue
        k = k.replace(".encoder.layers.", ".layers.")
        if k.endswith("token_embedding.weight") or k.endswith(
            "position_embedding.weight"
        ):
            out[k[: -len(".weight")] + ".embedding"] = v
        elif k.endswith(".weight") and v.ndim == 2:
            out[k[: -len(".weight")] + ".kernel"] = v.T
        elif k.endswith(".weight") and v.ndim == 1:
            out[k[: -len(".weight")] + ".scale"] = v
        else:
            out[k] = v
    return out


def clip_preprocess_images(
    images: jax.Array,  # (B, H, W, 3) in [-1, 1] or [0, 1]
    image_size: int = 224,
    input_range: tuple[float, float] = (-1.0, 1.0),
) -> jax.Array:
    """Differentiable CLIP preprocessing: rescale to [0,1], bicubic resize,
    mean/std normalize. Equivalent of the reference's AutoProcessor image path
    (``pickscore.py:44-51``), minus center-crop (inputs are square here)."""
    lo, hi = input_range
    x = (images.astype(jnp.float32) - lo) / (hi - lo)
    x = jnp.clip(x, 0.0, 1.0)
    b = x.shape[0]
    x = jax.image.resize(
        x, (b, image_size, image_size, 3), method="bicubic"
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


class PickScoreModel(nnx.Module):
    """CLIP dual tower + logit scale (the scoring model behind PickScore)."""

    def __init__(self, text_encoder, vision_encoder, logit_scale: float = 4.6052):
        self.text_encoder = text_encoder
        self.vision_encoder = vision_encoder
        self.logit_scale = FrozenRewardParam(
            jnp.asarray(logit_scale, dtype=jnp.float32)
        )
        # the judge is structurally untrainable: a full-FT DRaFT+ run whose
        # trainable tree (or grad filter) sweeps nnx.Param can never touch
        # the reward towers
        freeze_reward_params(self.text_encoder)
        freeze_reward_params(self.vision_encoder)

    def embed_images(self, images: jax.Array,
                     input_range=(-1.0, 1.0)) -> jax.Array:
        size = self.vision_encoder.config.image_size
        pixels = clip_preprocess_images(images, size, input_range)
        out = self.vision_encoder(pixels)
        embs = out.image_embeds
        return embs / jnp.linalg.norm(embs, axis=-1, keepdims=True)

    def embed_texts(self, input_ids: jax.Array) -> jax.Array:
        out = self.text_encoder(input_ids)
        embs = out.text_embeds
        return embs / jnp.linalg.norm(embs, axis=-1, keepdims=True)

    def score(self, images: jax.Array, input_ids: jax.Array,
              input_range=(-1.0, 1.0)) -> jax.Array:
        """Per-pair score: logit_scale.exp() * <text_i, image_i>
        (the diagonal of the reference's text @ image.T, ``pickscore.py:70-78``
        — its off-diagonal probs only matter for ranking multiple images
        against one prompt)."""
        image_embs = self.embed_images(images, input_range)
        text_embs = self.embed_texts(input_ids)
        scale = jnp.exp(self.logit_scale.value)
        return scale * jnp.sum(text_embs * image_embs, axis=-1)

    def probs(self, images: jax.Array, input_ids: jax.Array,
              input_range=(-1.0, 1.0)) -> jax.Array:
        """Reference-shape output: softmax over images for the FIRST prompt
        (``pickscore.py:74-81``)."""
        image_embs = self.embed_images(images, input_range)
        text_embs = self.embed_texts(input_ids)
        scale = jnp.exp(self.logit_scale.value)
        scores = scale * (text_embs @ image_embs.T)[0]
        return jax.nn.softmax(scores, axis=-1)

    @classmethod
    def from_local(cls, path: str, *, dtype=None) -> "PickScoreModel":
        """Load from a local HF CLIP directory (config.json + safetensors +
        tokenizer files), e.g. a snapshot of yuvalkirstain/PickScore_v1."""
        from safetensors.numpy import load_file

        from ..models.clip_vision import (
            CLIPVisionConfig,
            CLIPVisionModel,
            convert_hf_clip_vision,
        )
        from ..models.sdxl.text_encoder import CLIPTextConfig, CLIPTextModel
        from ..utils.state_dict import load_flat_state

        d = Path(path)
        hf = json.loads((d / "config.json").read_text())
        tc = hf.get("text_config", {})
        vc = hf.get("vision_config", {})
        projection_dim = hf.get("projection_dim", 1024)

        text_config = CLIPTextConfig(
            vocab_size=tc.get("vocab_size", 49408),
            hidden_size=tc.get("hidden_size", 1024),
            intermediate_size=tc.get("intermediate_size", 4096),
            num_hidden_layers=tc.get("num_hidden_layers", 24),
            num_attention_heads=tc.get("num_attention_heads", 16),
            max_position_embeddings=tc.get("max_position_embeddings", 77),
            hidden_act=tc.get("hidden_act", "gelu"),
            layer_norm_eps=tc.get("layer_norm_eps", 1e-5),
            projection_dim=projection_dim,
            eos_token_id=tc.get("eos_token_id", 2),
        )
        vision_config = CLIPVisionConfig(
            hidden_size=vc.get("hidden_size", 1280),
            intermediate_size=vc.get("intermediate_size", 5120),
            num_hidden_layers=vc.get("num_hidden_layers", 32),
            num_attention_heads=vc.get("num_attention_heads", 16),
            image_size=vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-5),
            hidden_act=vc.get("hidden_act", "gelu"),
            projection_dim=projection_dim,
        )
        rngs = nnx.Rngs(0)
        text = CLIPTextModel(text_config, with_projection=True, dtype=dtype,
                             rngs=rngs)
        vision = CLIPVisionModel(vision_config, with_projection=True,
                                 dtype=dtype, rngs=rngs)

        sd: dict[str, np.ndarray] = {}
        for f in sorted(d.glob("*.safetensors")):
            sd |= load_file(str(f))
        if not sd:
            raise FileNotFoundError(f"no safetensors under {path}")
        load_flat_state(text, convert_hf_clip_text(sd), strict=False)
        load_flat_state(vision, convert_hf_clip_vision(sd), strict=False)
        logit_scale = float(np.asarray(sd.get("logit_scale", 4.6052)))
        return cls(text, vision, logit_scale)


class PickScoreConfig(RewardModelConfig):
    type: Literal["pickscore"] = "pickscore"
    model_id: str = "yuvalkirstain/PickScore_v1"
    # local HF snapshot directory (no egress in this environment)
    weights_path: str | None = None
    max_token_length: int = 77

    def load_model(self) -> "PickScoreRewardModel":
        return PickScoreRewardModel(model_id=self.model_id,
                                    weights_path=self.weights_path,
                                    max_token_length=self.max_token_length)


class PickScoreRewardModel(RewardModelMixin):
    """Differentiable PickScore reward: (images NHWC [-1,1], prompts) ->
    per-sample scores. Tokenization is host-side (trace-constant prompts);
    the towers run in-graph."""

    def __init__(self, model_id: str = "yuvalkirstain/PickScore_v1",
                 weights_path: str | None = None,
                 score_fn: Callable | None = None,
                 max_token_length: int = 77,
                 model: PickScoreModel | None = None,
                 tokenizer=None):
        self.model_id = model_id
        self.weights_path = weights_path
        self.max_token_length = max_token_length
        self._score_fn = score_fn
        self._model = model
        self._tokenizer = tokenizer
        if self._model is None and weights_path is not None:
            self._model = PickScoreModel.from_local(weights_path)

    def set_score_fn(self, fn: Callable):
        self._score_fn = fn

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(
                self.weights_path or self.model_id
            )
        return self._tokenizer

    def tokenize(self, prompts: list[str]) -> jax.Array:
        enc = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=self.max_token_length, return_tensors="np",
        )
        return jnp.asarray(enc["input_ids"])

    def __call__(self, images: jax.Array, prompts: list[str]) -> jax.Array:
        if self._score_fn is not None:
            return self._score_fn(images, prompts)
        if self._model is None:
            raise RuntimeError(
                f"PickScore needs pretrained CLIP weights ({self.model_id}); "
                "this environment has no network egress. Provide "
                "weights_path (local HF snapshot) or inject score_fn."
            )
        input_ids = self.tokenize(list(prompts))
        return self._model.score(images, input_ids)
