"""JiT model pipeline: construction, checkpoint IO, Euler rectified-flow
sampling (rebuild of reference ``src/models/jit/pipeline.py``).

The denoising loop runs a jitted step (same compiled executable per step since
shapes are static); CFG batch-doubling, renorm, dynamic thresholding and the
CFG time-range gate match the reference (``pipeline.py:253-488``). Images are
NHWC in [-1, 1] internally.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils import PromptType
from ...utils import tensor as tensor_utils
from ...utils.state_dict import flatten_state, load_flat_state
from .class_encoder import ClassEncoder
from .config import ClassContextConfig, JiTConfig
from .convert import nnx_to_torch_with_conv_shape, torch_to_nnx
from .denoiser import Denoiser, JiT
from .text_encoder import TextEncoder


@nnx.jit(static_argnums=())
def _denoise_step(denoiser: JiT, image, timestep, context, context_mask,
                  original_size, target_size, crop_coords):
    return denoiser(
        image=image,
        timestep=timestep,
        context=context,
        original_size=original_size,
        target_size=target_size,
        crop_coords=crop_coords,
        context_mask=context_mask,
    )


class JiTModel:
    """JiT pipeline (reference ``pipeline.py:19-488``)."""

    denoiser_class: type[JiT] = Denoiser

    def __init__(
        self,
        config: JiTConfig,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs | None = None,
    ):
        self.config = config
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if dtype is None:
            dtype = config.jnp_dtype if config.jnp_dtype != jnp.float32 else None

        self.denoiser = self.denoiser_class(
            config.denoiser, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        if isinstance(config.context_encoder, ClassContextConfig):
            self.class_encoder = ClassEncoder(
                label2id=config.context_encoder.label2id,
                embedding_dim=config.denoiser.context_dim,
                splitter=config.context_encoder.splitter,
                do_mask_padding=config.context_encoder.do_mask_padding,
                param_dtype=param_dtype,
                rngs=rngs,
            )
            self.text_encoder = None
        else:
            # local directory -> load weights; HF repo id -> gated (no egress)
            pretrained = config.context_encoder.pretrained_model
            import os

            if os.path.isdir(pretrained):
                self.text_encoder = TextEncoder.from_local(pretrained)
            else:
                self.text_encoder = TextEncoder.from_remote(pretrained)
            self.class_encoder = None

    # ---------------------------------------------------------- checkpoint

    def _submodules(self) -> dict[str, nnx.Module]:
        mods: dict[str, nnx.Module] = {"denoiser": self.denoiser}
        if self.class_encoder is not None:
            mods["class_encoder"] = self.class_encoder
        return mods

    def state_dict(self) -> dict[str, np.ndarray]:
        """Torch-layout flat state dict with submodel prefixes (the
        reference's on-disk format, so checkpoints interoperate)."""
        flat: dict[str, np.ndarray] = {}
        for prefix, mod in self._submodules().items():
            for key, value in flatten_state(mod).items():
                flat[f"{prefix}.{key}"] = np.asarray(value)
        return nnx_to_torch_with_conv_shape(
            flat,
            patch_size=self.config.denoiser.patch_size,
            in_channels=self.config.denoiser.in_channels,
            rope_head_dim=self._rope_head_dim(),
        )

    def _rope_head_dim(self) -> int | None:
        """Head dim for the rotate-half weight permutation (convert.py);
        None for PoPE/NoPE variants, whose attention skips apply_rope."""
        cfg = self.config.denoiser
        if getattr(cfg, "positional_encoding", "rope") != "rope":
            return None
        return cfg.hidden_size // cfg.num_heads

    def save_checkpoint(self, path: str, metadata: dict[str, str] | None = None):
        from safetensors.numpy import save_file

        sd = {k: np.ascontiguousarray(v) for k, v in self.state_dict().items()}
        save_file(sd, path, metadata=metadata)

    def _load_checkpoint(self, checkpoint_path: str, strict: bool = True):
        from safetensors.numpy import load_file

        torch_sd = load_file(checkpoint_path)
        nnx_sd = torch_to_nnx(torch_sd, rope_head_dim=self._rope_head_dim())
        for prefix, mod in self._submodules().items():
            sub = {
                k[len(prefix) + 1 :]: v
                for k, v in nnx_sd.items()
                if k.startswith(prefix + ".")
            }
            load_flat_state(mod, sub, strict=strict)

    @classmethod
    def from_pretrained(
        cls, config: JiTConfig, checkpoint_path: str, **kwargs
    ) -> "JiTModel":
        model = cls(config, **kwargs)
        model._load_checkpoint(checkpoint_path)
        return model

    @classmethod
    def new_with_config(cls, config: JiTConfig, seed: int = 0, **kwargs) -> "JiTModel":
        return cls(config, rngs=nnx.Rngs(seed), **kwargs)

    # ---------------------------------------------------------- sampling

    def prepare_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """0 -> 1 linspace with num_steps+1 entries (reference
        ``pipeline.py:150-162``; JiT integrates from noise at t=0 to clean
        at t=1)."""
        return np.linspace(0.0, 1.0, num_inference_steps + 1, dtype=np.float32)

    def prepare_noisy_image(
        self,
        batch_size: int,
        height: int,
        width: int,
        dtype=jnp.float32,
        seed: int | None = None,
    ) -> jax.Array:
        return tensor_utils.incremental_seed_randn(
            (batch_size, height, width, 3), seed=seed, dtype=dtype
        )

    def normalize_prompts(self, prompt: PromptType) -> list[str]:
        return prompt if isinstance(prompt, list) else [prompt]

    def prepare_context_embeddings(
        self,
        prompts: PromptType,
        negative_prompt: PromptType,
        max_token_length: int = 64,
        do_cfg: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """Positive (+negative if CFG) context embeddings, batch-concatenated
        (reference ``pipeline.py:164-222``)."""
        if self.text_encoder is not None:
            out = self.text_encoder.encode_prompts(
                prompts,
                negative_prompts=negative_prompt,
                use_negative_prompts=do_cfg,
                max_token_length=max_token_length,
            )
            if do_cfg:
                emb = jnp.concatenate(
                    [out.positive_embeddings, out.negative_embeddings]
                )
                mask = jnp.concatenate(
                    [out.positive_attention_mask, out.negative_attention_mask]
                )
            else:
                emb, mask = out.positive_embeddings, out.positive_attention_mask
            return emb, mask

        emb, mask = self.class_encoder.encode_prompts(
            prompts, max_token_length=max_token_length
        )
        if do_cfg:
            neg_emb, neg_mask = self.class_encoder.encode_prompts(
                negative_prompt, max_token_length=max_token_length
            )
            # NOTE: the reference reuses the positive mask for the negative
            # half (``pipeline.py:207-214``); we use the correct negative mask.
            emb = jnp.concatenate([emb, neg_emb], axis=0)
            mask = jnp.concatenate([mask, neg_mask], axis=0)
        return emb, mask

    def prepare_image_size_inputs(
        self, width: int, height: int, batch_size: int, dtype=jnp.float32
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        original = jnp.tile(
            jnp.asarray([[height, width]], dtype=dtype), (batch_size, 1)
        )
        target = original
        crop = jnp.zeros((batch_size, 2), dtype=dtype)
        return original, target, crop

    def _scan_sample(self, noisy_image, ts, dts, context, mask, original_size,
                     target_size, crop_coords, cfg_scale, *, use_cfg: bool,
                     do_cfg_renorm: bool, do_dynamic_thresholding: bool):
        """Whole Euler loop in one jitted lax.scan (no per-step dispatch).
        Reuses the same velocity/CFG methods as the step-wise path, so the
        math is identical; only usable when CFG gating is constant across
        steps (the default)."""
        if not hasattr(self, "_scan_sample_jit"):
            def fn(denoiser, x, ts, dts, context, mask, osz, tsz, crop,
                   cfg_scale, use_cfg, do_cfg_renorm, do_dynamic_thresholding):
                def body(x, t_dt):
                    t, dt = t_dt
                    inp = jnp.concatenate([x, x]) if use_cfg else x
                    n = inp.shape[0]
                    pred = denoiser(
                        image=inp,
                        timestep=jnp.full((n,), t, dtype=jnp.float32),
                        context=context,
                        original_size=osz,
                        target_size=tsz,
                        crop_coords=crop,
                        context_mask=mask,
                    )
                    if use_cfg:
                        v = self.make_cfg_velocity_pred(
                            pred, x, t, cfg_scale=cfg_scale,
                            do_cfg_renorm=do_cfg_renorm,
                            do_dynamic_thresholding=do_dynamic_thresholding,
                        )
                    else:
                        v = self.make_velocity_pred(pred, x, t)
                    # keep the carry in the execution dtype (dt is f32 and
                    # would promote the carry)
                    return x + v.astype(x.dtype) * dt.astype(x.dtype), None

                x, _ = jax.lax.scan(body, x, (ts, dts))
                return x

            self._scan_sample_jit = nnx.jit(
                fn,
                static_argnames=(
                    "use_cfg", "do_cfg_renorm", "do_dynamic_thresholding"
                ),
            )
        return self._scan_sample_jit(
            self.denoiser, noisy_image, ts, dts, context, mask,
            original_size, target_size, crop_coords, cfg_scale,
            use_cfg=use_cfg, do_cfg_renorm=do_cfg_renorm,
            do_dynamic_thresholding=do_dynamic_thresholding,
        )

    # -- velocity conversions (reference ``pipeline.py:253-376``) ---------

    def image_to_velocity(self, image, noisy, timestep, clamp_eps: float = 1e-5):
        t = timestep.reshape(-1, 1, 1, 1)
        return (image - noisy) / jnp.maximum(1.0 - t, clamp_eps)

    def renorm_cfg(self, positive_velocity, cfg_velocity):
        # The reference norms over the last NCHW axis (width); the NHWC
        # equivalent is axis=2 (``pipeline.py:262-272``).
        pos_norm = jnp.linalg.norm(positive_velocity, axis=2, keepdims=True)
        cfg_norm = jnp.linalg.norm(cfg_velocity, axis=2, keepdims=True)
        return cfg_velocity * (pos_norm / jnp.maximum(cfg_norm, 1e-12))

    def dynamic_thresholding(self, images, percentile: float = 0.995):
        batch = images.shape[0]
        flat = jnp.abs(images.reshape(batch, -1))
        s = jnp.quantile(flat, percentile, axis=1, keepdims=True)
        s = jnp.maximum(s, 1.0).reshape(batch, 1, 1, 1)
        return jnp.clip(images, -s, s) / s

    def make_velocity_pred(self, model_pred, noisy_image, timestep):
        batch = noisy_image.shape[0]
        if self.config.model_pred == "image":
            return self.image_to_velocity(
                model_pred[:batch], noisy_image, jnp.broadcast_to(timestep, (batch,))
            ).astype(model_pred.dtype)
        if self.config.model_pred == "velocity":
            return model_pred[:batch]
        raise NotImplementedError(f"model_pred={self.config.model_pred}")

    def make_cfg_velocity_pred(
        self,
        model_pred,
        noisy_image,
        timestep,
        cfg_scale: float,
        do_cfg_renorm: bool = False,
        do_dynamic_thresholding: bool = False,
    ):
        batch = noisy_image.shape[0]
        t_b = jnp.broadcast_to(timestep, (batch,))
        if self.config.model_pred == "image":
            img_pos, img_neg = jnp.split(model_pred, 2, axis=0)
            v_pos = self.image_to_velocity(img_pos, noisy_image, t_b).astype(
                model_pred.dtype
            )
            v_neg = self.image_to_velocity(img_neg, noisy_image, t_b).astype(
                model_pred.dtype
            )
        elif self.config.model_pred == "velocity":
            v_pos, v_neg = jnp.split(model_pred, 2, axis=0)
        else:
            raise NotImplementedError(f"model_pred={self.config.model_pred}")

        velocity = v_pos + cfg_scale * (v_pos - v_neg)
        if do_cfg_renorm:
            velocity = self.renorm_cfg(v_pos, velocity)
        if do_dynamic_thresholding:
            image_pred = noisy_image + velocity * (1.0 - timestep)
            image_pred = self.dynamic_thresholding(image_pred)
            velocity = self.image_to_velocity(image_pred, noisy_image, t_b)
        return velocity

    # ---------------------------------------------------------- generate

    def generate(
        self,
        prompt: PromptType,
        negative_prompt: PromptType | None = None,
        width: int = 256,
        height: int = 256,
        num_inference_steps: int = 20,
        cfg_scale: float = 2.0,
        max_token_length: int = 64,
        seed: int | None = None,
        execution_dtype=jnp.bfloat16,
        do_cfg_renorm: bool = False,
        do_dynamic_thresholding: bool = False,
        cfg_time_range: tuple[float, float] = (0.0, 1.0),
        initial_noise: jax.Array | None = None,  # pre-made t=0 noise (NHWC)
        return_arrays: bool = False,
    ) -> list[Image.Image] | jax.Array:
        """Euler rectified-flow sampling (reference ``pipeline.py:378-488``)."""
        do_cfg = cfg_scale > 1.0
        timesteps = self.prepare_timesteps(num_inference_steps)
        prompts = self.normalize_prompts(prompt)
        batch_size = len(prompts)

        if initial_noise is not None:
            noisy_image = initial_noise.astype(execution_dtype)
        else:
            noisy_image = self.prepare_noisy_image(
                batch_size, height, width, dtype=execution_dtype, seed=seed
            )

        negative_prompts = self.normalize_prompts(
            negative_prompt if negative_prompt is not None else [""]
        )
        if len(negative_prompts) == 1 and batch_size > 1:
            negative_prompts = negative_prompts * batch_size

        prompt_embeddings, attention_mask = self.prepare_context_embeddings(
            prompts=prompts,
            negative_prompt=negative_prompts,
            max_token_length=max_token_length,
            do_cfg=do_cfg,
        )
        original_size, target_size, crop_coords = self.prepare_image_size_inputs(
            width, height, batch_size * 2 if do_cfg else batch_size,
            dtype=execution_dtype,
        )

        step_uses_cfg = [
            do_cfg and cfg_time_range[0] <= float(t) <= cfg_time_range[1]
            for t in timesteps[:-1]
        ]
        if len(set(step_uses_cfg)) == 1:
            # homogeneous CFG across steps (the default (0,1) range): run
            # the whole Euler loop as ONE scanned program — no per-step
            # dispatch / nnx traversal
            if do_cfg and not step_uses_cfg[0]:
                # CFG requested but cfg_time_range excludes every step:
                # context/size inputs were built batch-doubled — slice back
                # to the un-doubled batch the carried image has
                prompt_embeddings = prompt_embeddings[:batch_size]
                attention_mask = attention_mask[:batch_size]
                original_size = original_size[:batch_size]
                target_size = target_size[:batch_size]
                crop_coords = crop_coords[:batch_size]
            noisy_image = self._scan_sample(
                noisy_image,
                jnp.asarray(timesteps[:-1]),
                jnp.asarray(timesteps[1:] - timesteps[:-1]),
                prompt_embeddings,
                attention_mask,
                original_size,
                target_size,
                crop_coords,
                jnp.asarray(cfg_scale, dtype=jnp.float32),
                use_cfg=step_uses_cfg[0],
                do_cfg_renorm=do_cfg_renorm,
                do_dynamic_thresholding=do_dynamic_thresholding,
            )
            if return_arrays:
                return noisy_image
            return tensor_utils.tensor_to_images(noisy_image)

        for i, t in enumerate(timesteps[:-1]):
            use_cfg = step_uses_cfg[i]

            image_input = (
                jnp.concatenate([noisy_image] * 2) if use_cfg else noisy_image
            )
            n = image_input.shape[0]
            t_arr = jnp.full((n,), t, dtype=jnp.float32)

            model_pred = _denoise_step(
                self.denoiser,
                image_input,
                t_arr,
                prompt_embeddings[:n],
                attention_mask[:n],
                original_size[:n],
                target_size[:n],
                crop_coords[:n],
            )

            if use_cfg:
                velocity = self.make_cfg_velocity_pred(
                    model_pred,
                    noisy_image,
                    jnp.asarray(t, dtype=jnp.float32),
                    cfg_scale=cfg_scale,
                    do_cfg_renorm=do_cfg_renorm,
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
