"""Internal Guidance JiT (arXiv 2512.24176).

Rebuild of reference ``src/models/jit/extension/ig.py``: an extra final layer
on an intermediate block's output; forward returns (pred, intermediate_pred)
and generate blends ``ig_pred + ig_scale * (pred - ig_pred)`` within an
ig_time_range before CFG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx
from PIL import Image

from ....utils import PromptType, tensor as tensor_utils
from ..config import DenoiserConfig, JiTConfig
from ..denoiser import BottleneckFinalLayer, FinalLayer, JiT
from ..pipeline import JiTModel


class IGJiTDenoiserConfig(DenoiserConfig):
    intermediate_output_idx: int = 4


def _make_final_layer(config: DenoiserConfig, *, dtype, param_dtype, rngs,
                      bottleneck_dim: int | None = None):
    if config.use_output_bottleneck or bottleneck_dim is not None:
        return BottleneckFinalLayer(
            hidden_dim=config.hidden_size,
            bottleneck_dim=bottleneck_dim or config.bottleneck_dim,
            patch_size=config.patch_size,
            out_channels=config.out_channels,
            norm_type="rms",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
    return FinalLayer(
        hidden_dim=config.hidden_size,
        mlp_ratio=config.mlp_ratio,
        patch_size=config.patch_size,
        out_channels=config.out_channels,
        eps=1e-6, norm_type="rms",
        dtype=dtype, param_dtype=param_dtype, rngs=rngs,
    )


class IGJiT(JiT):
    """Reference ``ig.py:22-222``."""

    def __init__(self, config: IGJiTDenoiserConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.intermediate_final_layer = _make_final_layer(
            config, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, image, timestep, context, original_size, target_size,
                 crop_coords, context_mask=None):
        cfg = self.config
        height, width = image.shape[1], image.shape[2]
        (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        ) = self._prepare_inputs(
            image, timestep, context, original_size, target_size, crop_coords,
            context_mask,
        )
        context_len = context_embed.shape[1]
        intermediate_pred = None
        for i, block in enumerate(self.blocks):
            if i == cfg.context_start_block or (
                not cfg.do_context_fuse and i >= cfg.context_start_block
            ):
                tokens = jnp.concatenate([tokens, context_embed], axis=1)
            seq = tokens.shape[1]
            has_ctx = seq > prefix_len
            kv_lens = kv_lens_full if (has_ctx and kv_lens_full is not None) else None
            key_mask = (
                key_mask_full[:, :seq]
                if (has_ctx and key_mask_full is not None) else None
            )
            tokens = block(tokens, freqs[:seq], kv_lens=kv_lens, key_mask=key_mask)
            if not cfg.do_context_fuse and i >= cfg.context_start_block:
                tokens = tokens[:, :-context_len, :]
            if i == cfg.intermediate_output_idx:
                inter = self.intermediate_final_layer(tokens[:, :patches_len, :])
                intermediate_pred = self.unpatchify(inter, height, width)

        patches = self.final_layer(tokens[:, :patches_len, :])
        pred = self.unpatchify(patches, height, width)
        return pred, intermediate_pred


class Denoiser(IGJiT):
    pass


class IGJiTConfig(JiTConfig):
    denoiser: IGJiTDenoiserConfig = IGJiTDenoiserConfig()


class IGGenerateMixin:
    """Shared generate() for guidance models whose denoiser returns
    (pred, weak_pred) (reference ``ig.py:258-377``)."""

    def generate(
        self,
        prompt: PromptType,
        negative_prompt: PromptType | None = None,
        width: int = 256,
        height: int = 256,
        num_inference_steps: int = 20,
        cfg_scale: float = 2.0,
        ig_scale: float = 1.0,
        max_token_length: int = 64,
        seed: int | None = None,
        execution_dtype=jnp.bfloat16,
        do_cfg_renorm: bool = False,
        do_dynamic_thresholding: bool = False,
        cfg_time_range: tuple[float, float] = (0.0, 1.0),
        ig_time_range: tuple[float, float] = (0.0, 1.0),
        return_arrays: bool = False,
    ) -> list[Image.Image] | jax.Array:
        do_cfg = cfg_scale > 1.0
        do_ig = ig_scale > 1.0
        timesteps = self.prepare_timesteps(num_inference_steps)
        prompts = self.normalize_prompts(prompt)
        batch_size = len(prompts)

        noisy_image = self.prepare_noisy_image(
            batch_size, height, width, dtype=execution_dtype, seed=seed
        )
        negative_prompts = self.normalize_prompts(
            negative_prompt if negative_prompt is not None else [""]
        )
        if len(negative_prompts) == 1 and batch_size > 1:
            negative_prompts = negative_prompts * batch_size
        prompt_embeddings, attention_mask = self.prepare_context_embeddings(
            prompts=prompts, negative_prompt=negative_prompts,
            max_token_length=max_token_length, do_cfg=do_cfg,
        )
        original_size, target_size, crop_coords = self.prepare_image_size_inputs(
            width, height, batch_size * 2 if do_cfg else batch_size,
            dtype=execution_dtype,
        )

        for i, t in enumerate(timesteps[:-1]):
            in_cfg = cfg_time_range[0] <= float(t) <= cfg_time_range[1]
            in_ig = ig_time_range[0] <= float(t) <= ig_time_range[1]
            use_cfg = do_cfg and in_cfg
            image_input = (
                jnp.concatenate([noisy_image] * 2) if use_cfg else noisy_image
            )
            n = image_input.shape[0]
            t_arr = jnp.full((n,), t, dtype=jnp.float32)
            model_pred, weak_pred = self.denoiser(
                image_input, t_arr, prompt_embeddings[:n], original_size[:n],
                target_size[:n], crop_coords[:n],
                context_mask=attention_mask[:n],
            )
            if do_ig and in_ig and weak_pred is not None:
                model_pred = weak_pred + ig_scale * (model_pred - weak_pred)
            if use_cfg:
                velocity = self.make_cfg_velocity_pred(
                    model_pred, noisy_image, jnp.asarray(t, dtype=jnp.float32),
                    cfg_scale=cfg_scale, do_cfg_renorm=do_cfg_renorm,
                    do_dynamic_thresholding=do_dynamic_thresholding,
                )
            else:
                velocity = self.make_velocity_pred(
                    model_pred, noisy_image, jnp.asarray(t, dtype=jnp.float32)
                )
            noisy_image = noisy_image + velocity.astype(noisy_image.dtype) * float(
                timesteps[i + 1] - t
            )

        if return_arrays:
            return noisy_image
        return tensor_utils.tensor_to_images(noisy_image)


class IGJiTModel(IGGenerateMixin, JiTModel):
    denoiser_class = Denoiser
