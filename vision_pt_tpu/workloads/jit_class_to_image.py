"""JiT class-to-image rectified-flow training workload (rebuild of reference
``train/jit/class_to_image.py``).

Host side: class tokenization + CFG context dropout; device side (jitted):
timestep sampling (scale_shift_sigmoid), scaled-noise interpolation (clean at
t=1), denoiser forward, x-pred/v-pred loss in velocity or image space
(``treat_loss``, reference ``class_to_image.py:106-164``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from ..models.jit import JiTConfig, JiTModel
from ..ops.loss.flow_match import prepare_scaled_noised_latents
from ..ops.timestep.sampling import sample_timestep, TimestepSamplingType
from ..training.model import ModelForTraining


class JiTConfigForTraining(JiTConfig):
    """Reference ``class_to_image.py:26-42``."""

    checkpoint_path: str | None = None
    max_token_length: int = 64
    noise_scale: float = 1.0
    timestep_eps: float = 0.05
    loss_target: str = "velocity"  # "velocity" | "image"
    timestep_sampling: TimestepSamplingType = "scale_shift_sigmoid"
    train_class_encoder: bool = True
    drop_context_rate: float = 0.1

    @property
    def is_from_scratch(self) -> bool:
        return self.checkpoint_path is None


class JiTTrainable(nnx.Module):
    """The trainable module tree: denoiser + class encoder."""

    def __init__(self, denoiser, class_encoder):
        self.denoiser = denoiser
        self.class_encoder = class_encoder


class JiTForClassToImageTraining(ModelForTraining):
    model: JiTModel
    model_class: type[JiTModel] = JiTModel
    model_config: JiTConfigForTraining
    model_config_class = JiTConfigForTraining

    def setup_model(self):
        cfg = self.model_config
        if cfg.is_from_scratch:
            self.model = self.model_class.new_with_config(
                cfg, seed=self.config.seed
            )
        else:
            self.model = self.model_class.from_pretrained(cfg, cfg.checkpoint_path)
        self._trainable = JiTTrainable(
            self.model.denoiser, self.model.class_encoder
        )
        self._drop_rng = np.random.default_rng(self.config.seed + 1)

    def enable_gradient_checkpointing(self):
        self.model.denoiser.set_gradient_checkpointing(True)

    def trainable(self) -> nnx.Module:
        return self._trainable

    def sanity_check(self):
        size = 64
        batch = 2
        noise = jnp.zeros((batch, size, size, 3), dtype=jnp.float32)
        prompt = jnp.zeros(
            (batch, self.model_config.max_token_length,
             self.model.config.denoiser.context_dim),
        )
        t = jnp.full((batch,), 0.5)
        sizes = jnp.full((batch, 2), float(size))
        _ = self.model.denoiser(
            noise, t, prompt, sizes, sizes, jnp.zeros_like(sizes)
        )

    # ------------------------------------------------------------ batch

    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        captions: list[str] = batch["caption"]
        drop_context = (
            self._drop_rng.random() < self.model_config.drop_context_rate
        )
        if drop_context:
            captions = [""] * len(captions)
        ids, mask = self.model.class_encoder.tokenizer.tokenize(
            captions, max_length=self.model_config.max_token_length
        )
        if drop_context:
            # reference attends all tokens when context is dropped
            # (``class_to_image.py:195-196``)
            mask = np.ones_like(mask)
        if "latents" in batch:
            # latent-space JiT over a VAE-latent cache (data/latent_cache.py):
            # latents stand in for pixels end-to-end (in_channels=4 config)
            image = batch["latents"]
        else:
            image = batch["image"]
            if image.ndim == 4 and image.shape[-1] != 3 and image.shape[1] == 3:
                image = np.moveaxis(image, 1, -1)  # tolerate NCHW input
        return {
            "image": jnp.asarray(image),
            "class_ids": jnp.asarray(ids),
            "context_mask": jnp.asarray(mask),
        }

    # ------------------------------------------------------------ loss

    def _treat_loss(self, model_pred, noisy, clean, noise, timesteps):
        """Reference ``class_to_image.py:106-164``."""
        cfg = self.model_config
        eps = cfg.timestep_eps
        t = timesteps.reshape(-1, 1, 1, 1)
        pred32 = model_pred.astype(jnp.float32)
        clean32 = clean.astype(jnp.float32)
        noisy32 = noisy.astype(jnp.float32)

        if cfg.model_pred == "image":
            if cfg.loss_target == "velocity":
                denom = jnp.maximum(1.0 - t, eps)
                target_v = (clean32 - noisy32) / denom
                pred_v = (pred32 - noisy32) / denom
                return jnp.mean(jnp.square(pred_v - target_v))
            if cfg.loss_target == "image":
                return jnp.mean(jnp.square(pred32 - clean32))
            raise ValueError(f"Unknown loss target: {cfg.loss_target}")
        if cfg.model_pred == "velocity":
            if cfg.loss_target == "velocity":
                target_v = clean32 - noise.astype(jnp.float32)
                return jnp.mean(jnp.square(pred32 - target_v))
            raise NotImplementedError(
                "Velocity prediction with image loss is not implemented."
            )
        raise NotImplementedError(f"model_pred={cfg.model_pred}")

    def compute_loss(self, trainable: JiTTrainable, batch: dict, key: jax.Array):
        cfg = self.model_config
        images = batch["image"]
        batch_size = images.shape[0]
        k_t, k_noise = jax.random.split(jax.random.fold_in(key, 1))

        context = trainable.class_encoder(batch["class_ids"])
        if not cfg.train_class_encoder:
            context = jax.lax.stop_gradient(context)

        timesteps = sample_timestep(
            k_t, batch_size, cfg.timestep_sampling
        )
        noisy, noise = prepare_scaled_noised_latents(
            k_noise, images, timesteps, noise_scale=cfg.noise_scale
        )

        size = jnp.asarray(
            [[images.shape[1], images.shape[2]]], dtype=jnp.float32
        )
        size = jnp.tile(size, (batch_size, 1))

        model_pred = trainable.denoiser(
            noisy,
            timesteps,
            context,
            size,
            size,
            jnp.zeros_like(size),
            context_mask=batch["context_mask"],
        )
        l2_loss = self._treat_loss(model_pred, noisy, images, noise, timesteps)
        metrics = {"l2_loss": l2_loss}
        # observability for the packed kernel's no-max softmax: the bound
        # must stay <= BOUNDED_LOGIT_CLIP (60) for it to be exact softmax
        # (param-only, negligible cost inside the jitted step)
        bound = trainable.denoiser.qk_logit_bound()
        if bound is not None:
            metrics["qk_logit_bound"] = bound
        return l2_loss, metrics

    # ------------------------------------------------------------ preview

    def preview_step(self, preview_args, preview_index: int) -> list[Image.Image]:
        return self.model.generate(
            prompt=preview_args.prompt,
            negative_prompt=preview_args.negative_prompt,
            width=preview_args.width,
            height=preview_args.height,
            num_inference_steps=preview_args.num_steps,
            cfg_scale=preview_args.cfg_scale,
            max_token_length=self.model_config.max_token_length,
            seed=preview_args.seed,
        )
