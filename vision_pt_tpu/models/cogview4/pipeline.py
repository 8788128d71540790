"""CogView4 pipeline (rebuild of reference
``src/models/cogview4/pipeline.py``): checkpoint IO, linear time-shift
schedule with resolution-dependent mu, CFG Euler loop, VAE decode. Inference /
quantization focus — the reference ships no CogView4 training entry point.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.timestep.sampling import time_shift_linear
from ...utils import PromptType
from ...utils import tensor as tensor_utils
from ...utils.state_dict import flatten_state, load_flat_state
from ..sdxl.convert import unet_nnx_to_torch, unet_torch_to_nnx
from ..sdxl.vae import VAE
from .config import CogView4Config
from .denoiser import Denoiser
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH, TextEncoder


def calculate_time_shift(image_seq_len, base_seq_len: int = 256,
                         base_shift: float = 0.25,
                         max_shift: float = 0.75) -> float:
    """Resolution-dependent mu (reference ``scheduler.py:4-13``)."""
    m = (image_seq_len / base_seq_len) ** 0.5
    return m * max_shift + base_shift


def convert_from_original_key(key: str) -> str:
    key = key.replace("diffusion_model.", "denoiser.", 1)
    return key.replace("text_encoder.", "text_encoder.model.", 1)


def convert_to_original_key(key: str) -> str:
    key = key.replace("denoiser.", "diffusion_model.", 1)
    return key.replace("text_encoder.model.", "text_encoder.", 1)


@nnx.jit
def _denoise_step(denoiser, latents, ehs, timestep, osz, tsz, crop):
    return denoiser(latents, ehs, timestep, osz, tsz, crop)


# CogView4 ships a 16-channel SDXL-style KL VAE
COGVIEW4_VAE_CONFIG = dict(
    block_out_channels=(128, 512, 1024, 1024),
    latent_channels=16,
    layers_per_block=3,
    scaling_factor=1.0,
)


class CogView4Model:
    denoiser_class: type[Denoiser] = Denoiser

    def __init__(self, config: CogView4Config, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None,
                 tokenizer=None, build_text_encoder: bool = True):
        self.config = config
        rngs = rngs or nnx.Rngs(0)
        if dtype is None and config.jnp_dtype != jnp.float32:
            dtype = config.jnp_dtype
        self._dtype = dtype
        self.denoiser = self.denoiser_class(
            config.denoiser, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        vae_cfg = config.vae_config or COGVIEW4_VAE_CONFIG
        self.vae = VAE(**vae_cfg, dtype=dtype, param_dtype=param_dtype,
                       rngs=rngs)
        # the 6B GLM tower is optional at construction (inference tools often
        # work from precomputed embeddings)
        self.text_encoder = (
            TextEncoder.from_default(tokenizer, dtype=dtype, rngs=rngs)
            if build_text_encoder else None
        )

    @classmethod
    def from_config(cls, config: CogView4Config, **kw) -> "CogView4Model":
        return cls(config, **kw)

    # ---------------------------------------------------------- checkpoint

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        from safetensors.numpy import load_file

        from ...ops.quant import replace_by_prequantized_weights

        raw = load_file(checkpoint_path)
        sd = {convert_from_original_key(k): v for k, v in raw.items()}
        denoiser_sd = {
            k[len("denoiser."):]: v for k, v in sd.items()
            if k.startswith("denoiser.")
        }
        # rename diffusers FF sequential keys to our named attrs
        denoiser_sd = {
            k.replace(".ff.net.0.proj.", ".ff.proj.").replace(
                ".ff.net.2.", ".ff.out."
            ).replace(".to_out.0.", ".to_out."): v
            for k, v in denoiser_sd.items()
        }
        replace_by_prequantized_weights(
            self.denoiser, denoiser_sd
        )
        plain = {
            k: v for k, v in denoiser_sd.items()
            if ".weight." not in k  # skip quant-state children
        }
        load_flat_state(self.denoiser, unet_torch_to_nnx(plain), strict=strict)
        vae_sd = {
            k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")
        }
        if vae_sd:
            load_flat_state(self.vae, unet_torch_to_nnx(vae_sd), strict=strict)

    @classmethod
    def from_checkpoint(cls, config: CogView4Config, **kw) -> "CogView4Model":
        model = cls.from_config(config, **kw)
        model._load_checkpoint(config.checkpoint_path)
        return model

    def state_dict(self) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        denoiser_sd = unet_nnx_to_torch(
            {k: np.asarray(v) for k, v in flatten_state(self.denoiser).items()}
        )
        for k, v in denoiser_sd.items():
            k = k.replace(".ff.proj.", ".ff.net.0.proj.").replace(
                ".ff.out.", ".ff.net.2."
            ).replace(".to_out.", ".to_out.0.")
            out[f"denoiser.{k}"] = v
        for k, v in unet_nnx_to_torch(
            {k: np.asarray(v) for k, v in flatten_state(self.vae).items()}
        ).items():
            out[f"vae.{k}"] = v
        return {convert_to_original_key(k): v for k, v in out.items()}

    # ---------------------------------------------------------- sampling

    def prepare_latents(self, batch_size, height, width, dtype,
                        seed=None) -> jax.Array:
        shape = (
            batch_size,
            int(height) // int(self.vae.compression_ratio),
            int(width) // int(self.vae.compression_ratio),
            self.config.denoiser.in_channels,
        )
        return tensor_utils.incremental_seed_randn(shape, seed=seed, dtype=dtype)

    def decode_image(self, latents: jax.Array) -> list[Image.Image]:
        return tensor_utils.tensor_to_images(
            self.vae.decode(latents / self.vae.scaling_factor)
        )

    def prepare_timesteps(self, num_inference_steps: int, height: int,
                          width: int):
        """Linear int timesteps 1000 -> 1; sigmas linear-time-shifted by a
        resolution-dependent mu (reference ``pipeline.py:198-227``)."""
        image_seq_len = (
            (height // int(self.vae.compression_ratio))
            * (width // int(self.vae.compression_ratio))
            // (self.denoiser.patch_size**2)
        )
        timesteps = np.linspace(1000.0, 1.0, num_inference_steps).astype(
            np.int64
        ).astype(np.float32)
        sigmas = timesteps / 1000.0
        mu = calculate_time_shift(image_seq_len)
        sigmas = np.asarray(time_shift_linear(mu, jnp.asarray(sigmas)))
        return timesteps, np.concatenate([sigmas, [0.0]]).astype(np.float32)

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
        seed: int | None = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        execution_dtype=jnp.bfloat16,
        do_offloading: bool = False,
        return_latents: bool = False,
    ) -> list[Image.Image] | jax.Array:
        do_cfg = cfg_scale > 1.0
        timesteps, sigmas = self.prepare_timesteps(
            num_inference_steps, height, width
        )
        batch_size = len(prompt) if isinstance(prompt, list) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        encoder_output = self.text_encoder.encode_prompts(
            prompt, negative_prompt, use_negative_prompts=do_cfg,
            max_token_length=max_token_length,
        )
        latents = self.prepare_latents(
            batch_size, height, width, execution_dtype, seed=seed
        )
        if do_cfg:
            ehs = jnp.concatenate(
                [encoder_output.positive_embeddings,
                 encoder_output.negative_embeddings]
            )
        else:
            ehs = encoder_output.positive_embeddings
        ehs = ehs.astype(execution_dtype)
        osz = jnp.tile(jnp.asarray([original_size], jnp.float32), (batch_size, 1))
        tsz = jnp.tile(jnp.asarray([target_size], jnp.float32), (batch_size, 1))
        crop = jnp.tile(
            jnp.asarray([crop_coords_top_left], jnp.float32), (batch_size, 1)
        )
        if do_cfg:
            osz = jnp.concatenate([osz, osz])
            tsz = jnp.concatenate([tsz, tsz])
            crop = jnp.concatenate([crop, crop])

        for i, t in enumerate(timesteps):
            latent_in = jnp.concatenate([latents] * 2) if do_cfg else latents
            t_batch = jnp.full((latent_in.shape[0],), t, dtype=jnp.float32)
            velocity = _denoise_step(
                self.denoiser, latent_in, ehs, t_batch, osz, tsz, crop
            )
            if do_cfg:
                v_pos, v_neg = jnp.split(velocity, 2, axis=0)
                velocity = v_neg + cfg_scale * (v_pos - v_neg)
            dt = float(sigmas[i + 1] - sigmas[i])
            latents = latents + velocity.astype(latents.dtype) * dt

        if return_latents:
            return latents
        return self.decode_image(latents)
