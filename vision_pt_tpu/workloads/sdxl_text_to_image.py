"""SDXL DDPM epsilon-prediction fine-tuning workload (LoRA/QLoRA/full)
(rebuild of reference ``train/sdxl/text_to_image.py``).

Host side tokenizes chunked long prompts; the jitted loss runs text encoders
and VAE encode under stop_gradient (the reference's no_grad), uniform integer
timesteps, DDPM noising and eps-MSE. On TPU the whole step is one XLA program
— encoders, VAE and UNet fuse into a single compiled graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from ..models.sdxl import SDXLConfig, SDXLModel
from ..models.sdxl.convert import convert_to_comfy_key
from ..models.sdxl.text_encoder import CHUNK_LENGTH
from ..ops.long_prompt import tokenize_long_prompt
from ..ops.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ..ops.timestep.sampling import uniform_randint
from ..peft import get_adapter_parameters
from ..training.model import ModelForTraining


class SDXLForTextToImageTrainingConfig(SDXLConfig):
    max_token_length: int = 225  # 75 * 3


class SDXLTrainable(nnx.Module):
    """Trainable tree rooted like the reference SDXLModel so PEFT
    include/exclude keys ('attn1', exclude 'text_encoder'/'vae') match."""

    def __init__(self, denoiser, text_encoder_1, text_encoder_2, vae):
        self.denoiser = denoiser
        self.text_encoder = nnx.Dict(
            text_encoder_1=text_encoder_1, text_encoder_2=text_encoder_2
        )
        self.vae = vae


class SDXLForTextToImageTraining(ModelForTraining):
    model: SDXLModel
    model_config: SDXLForTextToImageTrainingConfig
    model_config_class = SDXLForTextToImageTrainingConfig

    def setup_model(self):
        cfg = self.model_config
        self.model = SDXLModel.from_config(cfg)
        if cfg.checkpoint_path:
            self.model._load_checkpoint(cfg.checkpoint_path)
        self._full_trainable = SDXLTrainable(
            self.model.denoiser,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )

    def trainable(self) -> nnx.Module:
        # full FT optimizes the denoiser only (the reference's encoders get no
        # grads under no_grad, so AdamW never touches them); PEFT needs the
        # full tree for include/exclude key matching, with the base frozen by
        # the AdapterParam wrt filter.
        if self._is_peft or self.config.peft is not None:
            return self._full_trainable
        return self._full_trainable.denoiser

    def enable_gradient_checkpointing(self):
        self.model.denoiser.set_gradient_checkpointing(True)

    def sanity_check(self):
        lat = jnp.zeros((1, 12, 12, self.model_config.denoiser.in_channels))
        ehs = jnp.zeros((1, 77, self.model_config.denoiser.context_dim))
        pooled = jnp.zeros((1, 1280))
        t = jnp.asarray([50.0])
        sz = jnp.full((1, 2), 96.0)
        _ = self.model.denoiser(lat, t, ehs, pooled, sz, sz, jnp.zeros_like(sz))

    # ------------------------------------------------------------ batch

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        captions: list[str] = batch["caption"]
        max_len = self.model_config.max_token_length
        te = self.model.text_encoder
        ids1, _ = tokenize_long_prompt(
            te.tokenizer_1, captions, max_length=max_len, chunk_length=CHUNK_LENGTH
        )
        ids2, _ = tokenize_long_prompt(
            te.tokenizer_2, captions, max_length=max_len, chunk_length=CHUNK_LENGTH
        )
        out = {
            "ids1": jnp.asarray(ids1),
            "ids2": jnp.asarray(ids2),
            "original_size": jnp.asarray(batch["original_size"], dtype=jnp.float32),
            "target_size": jnp.asarray(batch["target_size"], dtype=jnp.float32),
            "crop_coords_top_left": jnp.asarray(
                batch["crop_coords_top_left"], dtype=jnp.float32
            ),
        }
        if "latents" in batch:
            # cached-VAE-latent mode (data/latent_cache.py): already sampled
            # and scaled on the host; the step starts at the denoiser
            out["latents"] = jnp.asarray(batch["latents"])
        else:
            image = batch["image"]
            if image.ndim == 4 and image.shape[-1] != 3 and image.shape[1] == 3:
                image = np.moveaxis(image, 1, -1)
            out["image"] = jnp.asarray(image)
        return out

    # ------------------------------------------------------------ loss

    def _encode_text(self, trainable, ids1, ids2, batch_size: int):
        from ..models.sdxl.text_encoder import _merge_chunks

        if isinstance(trainable, SDXLTrainable):
            te1 = trainable.text_encoder["text_encoder_1"]
            te2 = trainable.text_encoder["text_encoder_2"]
        else:  # denoiser-only trainable: use the frozen pipeline encoders
            te1 = self.model.text_encoder.text_encoder_1
            te2 = self.model.text_encoder.text_encoder_2
        out1 = te1(ids1)
        out2 = te2(ids2)
        emb1 = _merge_chunks(out1.penultimate_hidden_state, batch_size)
        emb2 = _merge_chunks(out2.penultimate_hidden_state, batch_size)
        ehs = jnp.concatenate([emb1, emb2], axis=-1)
        pooled = out2.text_embeds.reshape(batch_size, -1,
                                          out2.text_embeds.shape[-1])[:, 0]
        return jax.lax.stop_gradient(ehs), jax.lax.stop_gradient(pooled)

    def compute_loss(self, trainable, batch: dict, key: jax.Array):
        batch_size = (
            batch["latents"] if "latents" in batch else batch["image"]
        ).shape[0]
        k_vae, k_t, k_noise = jax.random.split(jax.random.fold_in(key, 2), 3)

        denoiser = (
            trainable.denoiser if isinstance(trainable, SDXLTrainable)
            else trainable
        )
        vae = self.model.vae

        ehs, pooled = self._encode_text(
            trainable, batch["ids1"], batch["ids2"], batch_size
        )

        if "latents" in batch:
            latents = batch["latents"]  # cached: sampled + scaled offline
        else:
            dist = vae.encode(batch["image"])
            latents = jax.lax.stop_gradient(
                dist.sample(k_vae) * vae.scaling_factor
            )

        timesteps = uniform_randint(k_t, batch_size, 0, 1000)
        noisy, noise = prepare_noised_latents(k_noise, latents, timesteps)

        noise_pred = denoiser(
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

    # ------------------------------------------------------------ save/preview

    def get_state_dict_to_save(self) -> dict[str, np.ndarray]:
        if not self._is_peft:
            return self.model.state_dict()
        sd = get_adapter_parameters(self._full_trainable)
        return {convert_to_comfy_key(k): v for k, v in sd.items()}

    def preview_step(self, preview_args, preview_index: int) -> list[Image.Image]:
        return self.model.generate(
            prompt=preview_args.prompt,
            negative_prompt=(
                preview_args.negative_prompt
                if preview_args.negative_prompt is not None
                else ("" if preview_args.cfg_scale > 0 else None)
            ),
            width=preview_args.width,
            height=preview_args.height,
            num_inference_steps=preview_args.num_steps,
            cfg_scale=preview_args.cfg_scale,
            seed=preview_args.seed,
            max_token_length=self.model_config.max_token_length,
        )
