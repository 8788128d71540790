"""SDXL style tokenizer training workload (rebuild of reference
``train/sdxl/style_tokenizer.py``).

The projectors train (AdapterParam) while UNet/encoders/VAE stay frozen via
the wrt filter; gradients flow THROUGH the frozen text encoders into the
style embeddings, so the text encode runs inside the jitted loss (unlike the
other SDXL workloads, no stop_gradient around it).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from ..adapters.ip_adapter import retype_to_adapter_params
from ..models.sdxl.adapter.style_tokenizer import (
    SDXLModelWithStyleTokenizer,
    SDXLModelWithStyleTokenizerConfig,
)
from ..models.sdxl.text_encoder import CHUNK_LENGTH, _merge_chunks
from ..ops.long_prompt import tokenize_long_prompt
from ..ops.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ..ops.timestep.sampling import gaussian_randint, uniform_randint
from .sdxl_text_to_image import SDXLForTextToImageTraining


class SDXLModelWithStyleTokenizerTrainingConfig(
    SDXLModelWithStyleTokenizerConfig
):
    """Reference ``style_tokenizer.py:32-40``."""

    max_token_length: int = 225
    drop_image_rate: float = 0.1
    freeze_vision_encoder: bool = True
    freeze_projector: bool = False
    timestep_sampling: Literal["uniform", "gaussian"] = "uniform"
    timestep_sampling_args: dict = {}


class StyleTokenizerTrainable(nnx.Module):
    def __init__(self, denoiser, projector_1, projector_2, text_encoder_1,
                 text_encoder_2, vae):
        self.denoiser = denoiser
        self.projector_1 = projector_1
        self.projector_2 = projector_2
        self.text_encoder = nnx.Dict(
            text_encoder_1=text_encoder_1, text_encoder_2=text_encoder_2
        )
        self.vae = vae


class SDXLStyleTokenizerTraining(SDXLForTextToImageTraining):
    """Reference ``train/sdxl/style_tokenizer.py:43-319``."""

    model: SDXLModelWithStyleTokenizer
    model_config: SDXLModelWithStyleTokenizerTrainingConfig
    model_config_class = SDXLModelWithStyleTokenizerTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        if not cfg.freeze_vision_encoder:
            raise NotImplementedError(
                "training the vision tower needs local pretrained weights; "
                "only freeze_vision_encoder=True is supported offline"
            )
        self.model = SDXLModelWithStyleTokenizer(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        elif self.model.text_encoder.tokenizer_1 is not None:
            self.model.setup_style_token()
        if not cfg.freeze_projector:
            retype_to_adapter_params(self.model.projector_1)
            retype_to_adapter_params(self.model.projector_2)
            self.model.manager.set_adapter_trainable(True)
        self._full_trainable = StyleTokenizerTrainable(
            self.model.denoiser,
            self.model.projector_1,
            self.model.projector_2,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )
        self._set_is_peft(True)
        self._drop_rng = np.random.default_rng(self.config.seed + 13)

    def trainable(self) -> nnx.Module:
        return self._full_trainable

    def _sample_timesteps(self, key: jax.Array, batch_size: int) -> jax.Array:
        args = self.model_config.timestep_sampling_args
        if self.model_config.timestep_sampling == "gaussian":
            return gaussian_randint(
                key, batch_size,
                min_timesteps=args.get("min_timesteps", 0),
                max_timesteps=args.get("max_timesteps", 1000),
                mean=args.get("mean", 100),
                std=args.get("std", 100),
            )
        return uniform_randint(
            key, batch_size,
            min_timesteps=args.get("min_timesteps", 0),
            max_timesteps=args.get("max_timesteps", 1000),
        )

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        captions: list[str] = batch["caption"]
        te = self.model.text_encoder
        max_len = self.model_config.max_token_length
        # encoder 1 sees the expanded placeholder; encoder 2 does not
        # (reference asymmetry, style_tokenizer.py:122-127 vs :243-248)
        ids1, _ = tokenize_long_prompt(
            te.tokenizer_1, te.preprocess_style_token(captions),
            max_length=max_len, chunk_length=CHUNK_LENGTH,
        )
        ids2, _ = tokenize_long_prompt(
            te.tokenizer_2, captions, max_length=max_len,
            chunk_length=CHUNK_LENGTH,
        )
        image = batch["image"]
        if image.ndim == 4 and image.shape[-1] != 3 and image.shape[1] == 3:
            image = np.moveaxis(image, 1, -1)
        ref_source = batch.get("reference_image")
        if ref_source is None:
            ref_source = image
        ref = np.asarray(ref_source, dtype=np.float32)
        if ref.shape[1] == 3 and ref.shape[-1] != 3:
            ref = np.moveaxis(ref, 1, -1)
        size = self.model_config.adapter.image_size
        ref_resized = jax.image.resize(
            jnp.asarray(ref),
            (ref.shape[0], size, size, ref.shape[-1]), "linear",
        )
        drop = self._drop_rng.random(image.shape[0]) < (
            self.model_config.drop_image_rate
        )
        return {
            "image": jnp.asarray(image),
            "ids1": jnp.asarray(ids1),
            "ids2": jnp.asarray(ids2),
            "reference_pixels": self.model.preprocess_reference_image(
                ref_resized
            ),
            "drop_image": jnp.asarray(drop),
            "original_size": jnp.asarray(batch["original_size"],
                                         dtype=jnp.float32),
            "target_size": jnp.asarray(batch["target_size"],
                                       dtype=jnp.float32),
            "crop_coords_top_left": jnp.asarray(
                batch["crop_coords_top_left"], dtype=jnp.float32
            ),
        }

    def compute_loss(self, trainable: StyleTokenizerTrainable, batch, key):
        images = batch["image"]
        batch_size = images.shape[0]
        k_vae, k_t, k_noise = jax.random.split(jax.random.fold_in(key, 6), 3)

        te = self.model.text_encoder
        features = jax.lax.stop_gradient(
            self.model.vision_encoder(batch["reference_pixels"])
        )
        drop = batch["drop_image"][:, None, None]
        style_1 = jnp.where(
            drop, 0.0, trainable.projector_1(features).style_tokens
        )
        style_2 = jnp.where(
            drop, 0.0, trainable.projector_2(features).style_tokens
        )

        # text encode WITH gradients into the style embeddings
        out1 = trainable.text_encoder["text_encoder_1"](
            batch["ids1"], style_embeddings=style_1,
            style_token_id=te.style_token_id_1,
        )
        out2 = trainable.text_encoder["text_encoder_2"](
            batch["ids2"], style_embeddings=style_2,
            style_token_id=te.style_token_id_2,
        )
        emb1 = _merge_chunks(out1.penultimate_hidden_state, batch_size)
        emb2 = _merge_chunks(out2.penultimate_hidden_state, batch_size)
        # encoder-1 context is 75*N+2 long while encoder-2 ran unexpanded —
        # align on the shorter sequence before the channel concat
        seq = min(emb1.shape[1], emb2.shape[1])
        ehs = jnp.concatenate([emb1[:, :seq], emb2[:, :seq]], axis=-1)
        pooled = out2.text_embeds.reshape(
            batch_size, -1, out2.text_embeds.shape[-1]
        )[:, 0]

        vae = self.model.vae
        latents = jax.lax.stop_gradient(
            vae.encode(images).sample(k_vae) * vae.scaling_factor
        )
        timesteps = self._sample_timesteps(k_t, batch_size)
        noisy, noise = prepare_noised_latents(k_noise, latents, timesteps)

        noise_pred = trainable.denoiser(
            noisy,
            timesteps.astype(jnp.float32),
            ehs,
            pooled,
            batch["original_size"],
            batch["target_size"],
            batch["crop_coords_top_left"],
        )
        l2_loss = loss_with_predicted_noise(latents, noise, noise_pred)
        return l2_loss, {"l2_loss": l2_loss}

    # ------------------------------------------------------------ save

    def get_state_dict_to_save(self) -> dict[str, np.ndarray]:
        return self.model.adapter_state_dict()

    def preview_step(self, preview_args, preview_index: int) -> list[Image.Image]:
        reference_image = None
        extra = getattr(preview_args, "extra", None) or {}
        if path := extra.get("reference_image_path"):
            reference_image = Image.open(path).convert("RGB")
        return self.model.generate(
            prompt=preview_args.prompt,
            negative_prompt=preview_args.negative_prompt or "",
            reference_image=reference_image,
            width=preview_args.width,
            height=preview_args.height,
            num_inference_steps=preview_args.num_steps,
            cfg_scale=preview_args.cfg_scale,
            seed=preview_args.seed,
            max_token_length=self.model_config.max_token_length,
        )
