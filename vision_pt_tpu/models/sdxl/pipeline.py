"""SDXL pipeline: checkpoint IO + Euler-ancestral CFG sampling
(rebuild of reference ``src/models/sdxl/pipeline.py``).

Latents are NHWC; each sampler step runs a jitted denoiser call; checkpoint
import/export speaks the original sgm single-file key layout (and comfy keys
for adapters) through the converters so existing SDXL checkpoints load.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils import PromptType
from ...utils import tensor as tensor_utils
from ...utils.state_dict import (
    convert_open_clip_to_transformers,
    convert_transformers_to_open_clip,
    flatten_state,
    load_flat_state,
)
from .config import SDXLConfig
from .convert import (
    convert_from_original_key,
    convert_to_original_key,
    unet_nnx_to_torch,
    unet_torch_to_nnx,
)
from .denoiser import Denoiser
from .scheduler import Scheduler
from .text_encoder import MultipleTextEncodingOutput, TextEncoder
from .vae import VAE


@nnx.jit
def _denoise_step(denoiser, latents, timestep, ehs, pooled, osz, tsz, crop,
                  cross_attention_kwargs=None):
    return denoiser(latents, timestep, ehs, pooled, osz, tsz, crop,
                    cross_attention_kwargs=cross_attention_kwargs)


def _fix_vae_attention_projections(sd: dict[str, np.ndarray]) -> dict:
    """Original-format VAEs store attention projections as 4D 1x1 convs;
    flatten to 2D (reference ``vae.py:52-85``)."""
    import re

    for key in list(sd.keys()):
        if re.search(r".*\.to_(q|k|v|out)\.(\d+\.)?weight$", key):
            value = np.asarray(sd[key])
            if value.ndim == 4:
                sd[key] = value[:, :, 0, 0]
    return sd


class SDXLModel:
    """Reference ``pipeline.py:25-418``."""

    denoiser_class: type[Denoiser] = Denoiser
    text_encoder_class: type[TextEncoder] = TextEncoder

    def __init__(self, config: SDXLConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        self.config = config
        rngs = rngs or nnx.Rngs(0)
        if dtype is None and config.jnp_dtype != jnp.float32:
            dtype = config.jnp_dtype
        self._dtype = dtype
        self.denoiser = self.denoiser_class(
            config.denoiser, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        if config.vae_config is not None:
            self.vae = VAE(**config.vae_config, dtype=dtype,
                           param_dtype=param_dtype, rngs=rngs)
        else:
            self.vae = VAE.from_default(dtype=dtype, param_dtype=param_dtype,
                                        rngs=rngs)
        if config.text_encoder_1_config or config.text_encoder_2_config:
            from .text_encoder import (
                TEXT_ENCODER_1_CONFIG,
                TEXT_ENCODER_2_CONFIG,
                CLIPTextConfig,
                CLIPTextModel,
            )

            c1 = (
                CLIPTextConfig(**config.text_encoder_1_config)
                if config.text_encoder_1_config else TEXT_ENCODER_1_CONFIG
            )
            c2 = (
                CLIPTextConfig(**config.text_encoder_2_config)
                if config.text_encoder_2_config else TEXT_ENCODER_2_CONFIG
            )
            self.text_encoder = self.text_encoder_class(
                CLIPTextModel(c1, dtype=dtype, param_dtype=param_dtype, rngs=rngs),
                None,
                CLIPTextModel(c2, with_projection=True, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs),
                None,
            )
        else:
            self.text_encoder = self.text_encoder_class.from_default(
                dtype=dtype, param_dtype=param_dtype, rngs=rngs
            )
        self.scheduler = Scheduler()

    @classmethod
    def from_config(cls, config: SDXLConfig, **kw) -> "SDXLModel":
        return cls(config, **kw)

    # ---------------------------------------------------------- checkpoint

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        from safetensors.numpy import load_file

        raw = load_file(checkpoint_path)
        sd = {convert_from_original_key(k): v for k, v in raw.items()}

        te_sd = {k: v for k, v in sd.items() if k.startswith("text_encoder.")}
        te1 = {
            k[len("text_encoder.text_encoder_1."):]: v
            for k, v in te_sd.items()
            if k.startswith("text_encoder.text_encoder_1.")
            and ".embeddings.position_ids" not in k
        }
        te2 = convert_open_clip_to_transformers(
            {
                k[len("text_encoder.text_encoder_2."):]: v
                for k, v in te_sd.items()
                if k.startswith("text_encoder.text_encoder_2.")
            }
        )

        denoiser_sd = {
            k[len("denoiser."):]: v for k, v in sd.items()
            if k.startswith("denoiser.")
        }
        vae_sd = _fix_vae_attention_projections(
            {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")}
        )

        load_flat_state(self.denoiser, unet_torch_to_nnx(denoiser_sd),
                        strict=strict)
        load_flat_state(self.vae, unet_torch_to_nnx(vae_sd), strict=strict)
        load_flat_state(self.text_encoder.text_encoder_1,
                        unet_torch_to_nnx(_embed_fix(te1)), strict=strict)
        load_flat_state(self.text_encoder.text_encoder_2,
                        unet_torch_to_nnx(_embed_fix(te2)), strict=strict)

    @classmethod
    def from_checkpoint(cls, config: SDXLConfig, **kw) -> "SDXLModel":
        model = cls.from_config(config, **kw)
        model._load_checkpoint(config.checkpoint_path)
        return model

    def state_dict(self) -> dict[str, np.ndarray]:
        """Original sgm key layout (reference ``pipeline.py:116-151``)."""
        out: dict[str, np.ndarray] = {}
        for prefix, module in [
            ("denoiser.", self.denoiser),
            ("vae.", self.vae),
            ("text_encoder.text_encoder_1.", self.text_encoder.text_encoder_1),
            ("text_encoder.text_encoder_2.", self.text_encoder.text_encoder_2),
        ]:
            flat = {
                k: np.asarray(v) for k, v in flatten_state(module).items()
            }
            torch_sd = _embed_unfix(unet_nnx_to_torch(flat))
            if prefix.endswith("text_encoder_2."):
                torch_sd = convert_transformers_to_open_clip(torch_sd)
            for k, v in torch_sd.items():
                out[prefix + k] = v
        return {convert_to_original_key(k): v for k, v in out.items()}

    # ---------------------------------------------------------- latents/vae

    def prepare_latents(self, batch_size: int, height: int, width: int,
                        dtype, max_noise_sigma: float,
                        seed: int | None = None,
                        latents: jax.Array | None = None) -> jax.Array:
        if latents is not None:
            return latents.astype(dtype)
        shape = (
            batch_size,
            int(height) // self.vae.compression_ratio,
            int(width) // self.vae.compression_ratio,
            self.denoiser.config.in_channels,
        )
        return tensor_utils.incremental_seed_randn(
            shape, seed=seed, dtype=dtype
        ) * max_noise_sigma

    def encode_image(self, image, key: jax.Array | None = None) -> jax.Array:
        """PIL/array -> scaled latents (reference ``pipeline.py:188-205``)."""
        if isinstance(image, (Image.Image, list)):
            images = image if isinstance(image, list) else [image]
            tensor = tensor_utils.images_to_tensor(images)
        else:
            tensor = image
        dist = self.vae.encode(tensor.astype(self._dtype or jnp.float32))
        key = key if key is not None else jax.random.key(0)
        return dist.sample(key) * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array,
                     use_tiling: bool = False) -> list[Image.Image]:
        scaled = latents / self.vae.scaling_factor
        image = (
            self.vae.tiled_decode(scaled) if use_tiling
            else self.vae.decode(scaled)
        )
        return tensor_utils.tensor_to_images(image)

    # ---------------------------------------------------------- text

    def prepare_timesteps(self, num_inference_steps: int):
        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(timesteps)
        return timesteps, sigmas

    def prepare_encoder_hidden_states(
        self, encoder_output: MultipleTextEncodingOutput, do_cfg: bool
    ) -> tuple[jax.Array, jax.Array]:
        """Concat CLIP-L (768) + bigG (1280) -> 2048 context; pooled from bigG
        (reference ``pipeline.py:239-284``)."""
        te1, te2 = encoder_output.text_encoder_1, encoder_output.text_encoder_2
        pos = jnp.concatenate(
            [te1.positive_embeddings, te2.positive_embeddings], axis=-1
        )
        if do_cfg:
            neg = jnp.concatenate(
                [te1.negative_embeddings, te2.negative_embeddings], axis=-1
            )
            return (
                jnp.concatenate([pos, neg], axis=0),
                jnp.concatenate(
                    [te2.pooled_positive_embeddings,
                     te2.pooled_negative_embeddings], axis=0,
                ),
            )
        return pos, te2.pooled_positive_embeddings

    # ---------------------------------------------------------- generate

    def generate(
        self,
        prompt: PromptType,
        negative_prompt: PromptType | None = None,
        width: int = 768,
        height: int = 768,
        original_size: tuple[int, int] | None = None,
        target_size: tuple[int, int] | None = None,
        crop_coords_top_left: tuple[int, int] = (0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        max_token_length: int = 75,
        seed: int | None = None,
        execution_dtype=jnp.bfloat16,
        do_offloading: bool = False,  # accepted for API compat; HBM fits SDXL
        latents: jax.Array | None = None,  # pre-made init latents (NHWC)
        return_latents: bool = False,
        cross_attention_kwargs: dict | None = None,
        extra_context_tokens: jax.Array | None = None,
        _encode_prompts_kwargs: dict | None = None,
    ) -> list[Image.Image] | jax.Array:
        do_cfg = cfg_scale > 1.0
        timesteps, sigmas = self.prepare_timesteps(num_inference_steps)
        batch_size = len(prompt) if isinstance(prompt, list) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        should_tile = max(height, width) >= 1536

        encoder_output = self.text_encoder.encode_prompts(
            prompt, negative_prompt, use_negative_prompts=do_cfg,
            max_token_length=max_token_length,
            **(_encode_prompts_kwargs or {}),
        )
        latents = self.prepare_latents(
            batch_size, height, width, execution_dtype,
            max_noise_sigma=self.scheduler.get_max_noise_sigma(sigmas),
            seed=seed, latents=latents,
        )
        ehs, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        ehs = ehs.astype(execution_dtype)
        if extra_context_tokens is not None:
            # e.g. PFG image tokens, already batched [positive; negative]
            ehs = jnp.concatenate(
                [ehs, extra_context_tokens.astype(execution_dtype)], axis=1
            )
        pooled = pooled.astype(execution_dtype)
        n = ehs.shape[0]
        osz = jnp.broadcast_to(
            jnp.asarray(original_size, dtype=jnp.float32), (n, 2))
        tsz = jnp.broadcast_to(
            jnp.asarray(target_size, dtype=jnp.float32), (n, 2))
        crop = jnp.broadcast_to(
            jnp.asarray(crop_coords_top_left, dtype=jnp.float32), (n, 2))

        step_key = jax.random.key(seed if seed is not None else 0)
        # per-step ancestral-noise keys, derived ONCE so the scanned and
        # step-wise paths produce identical images for the same seed
        keys = jax.random.split(step_key, len(timesteps))
        if cross_attention_kwargs is None:
            # whole sampler as ONE scanned program (no per-step dispatch /
            # nnx traversal); adapters passing cross_attention_kwargs use
            # the step-wise fallback below
            latents = self._scan_sample(
                latents,
                jnp.asarray(timesteps),
                jnp.asarray(sigmas[:-1]),
                jnp.asarray(sigmas[1:]),
                keys, ehs, pooled, osz, tsz, crop,
                jnp.asarray(cfg_scale, dtype=jnp.float32),
                do_cfg=do_cfg,
            )
        else:
            for i, current_timestep in enumerate(timesteps):
                sigma, next_sigma = sigmas[i], sigmas[i + 1]
                latent_in = (
                    jnp.concatenate([latents] * 2) if do_cfg else latents
                )
                latent_in = self.scheduler.scale_model_input(latent_in, sigma)
                t_batch = jnp.full((latent_in.shape[0],), current_timestep,
                                   dtype=jnp.float32)
                noise_pred = _denoise_step(
                    self.denoiser, latent_in, t_batch, ehs, pooled, osz, tsz,
                    crop, cross_attention_kwargs,
                )
                if do_cfg:
                    pos_pred, neg_pred = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = neg_pred + cfg_scale * (pos_pred - neg_pred)
                latents = self.scheduler.ancestral_step(
                    keys[i], latents, noise_pred, sigma, next_sigma
                )

        if return_latents:
            return latents
        return self.decode_image(latents, use_tiling=should_tile)

    def _scan_sample(self, latents, ts, sigmas, next_sigmas, keys, ehs,
                     pooled, osz, tsz, crop, cfg_scale, *, do_cfg: bool):
        """Scanned ancestral-Euler loop (same scheduler math as the
        step-wise path; per-step noise keys precomputed)."""
        if not hasattr(self, "_scan_sample_jit"):
            def fn(denoiser, latents, ts, sigmas, next_sigmas, keys, ehs,
                   pooled, osz, tsz, crop, cfg_scale, do_cfg):
                def body(latents, xs):
                    t, sigma, next_sigma, key = xs
                    latent_in = (
                        jnp.concatenate([latents] * 2) if do_cfg else latents
                    )
                    latent_in = self.scheduler.scale_model_input(
                        latent_in, sigma
                    )
                    t_batch = jnp.full(
                        (latent_in.shape[0],), t, dtype=jnp.float32
                    )
                    noise_pred = denoiser(
                        latent_in, t_batch, ehs, pooled, osz, tsz, crop
                    )
                    if do_cfg:
                        pos_pred, neg_pred = jnp.split(noise_pred, 2, axis=0)
                        noise_pred = neg_pred + cfg_scale * (
                            pos_pred - neg_pred
                        )
                    latents = self.scheduler.ancestral_step(
                        key, latents, noise_pred, sigma, next_sigma
                    )
                    return latents, None

                latents, _ = jax.lax.scan(
                    body, latents, (ts, sigmas, next_sigmas, keys)
                )
                return latents

            self._scan_sample_jit = nnx.jit(fn, static_argnames=("do_cfg",))
        return self._scan_sample_jit(
            self.denoiser, latents, ts, sigmas, next_sigmas, keys, ehs,
            pooled, osz, tsz, crop, cfg_scale, do_cfg=do_cfg,
        )


def _embed_fix(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """token/position embedding .weight -> nnx Embed .embedding (no T)."""
    out = {}
    for k, v in sd.items():
        if k.endswith("embedding.weight") or k.endswith("embed_tokens.weight"):
            out[k[: -len(".weight")] + ".embedding"] = v
        else:
            out[k] = v
    return out


def _embed_unfix(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.endswith("embedding.embedding"):
            out[k[: -len(".embedding")] + ".weight"] = v
        else:
            out[k] = v
    return out
