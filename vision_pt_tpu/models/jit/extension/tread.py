"""TREAD token routing (training-time compute reduction).

Rebuild of reference ``train/jit/class_to_image_tread.py:35-380``: between
tread_start_block and tread_end_block only a random subset of patch tokens is
processed; routed-out tokens rejoin via the inverse permutation.

XLA notes: the keep count is static (rate x num_patches at trace time); the
permutation itself is a traced value, so keeps/routes are static-shape dynamic
gathers. Token layout here is [patches, info(size+time), context] with context
present at every block (reset to the raw embedding unless do_context_fuse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import DenoiserConfig, JiTConfig
from ..denoiser import JiT
from ..pipeline import JiTModel


class JiTWithTreadDenoiserConfig(DenoiserConfig):
    tread_route_rate: float = 0.5  # fraction of patch tokens KEPT
    tread_start_block: int = 2
    tread_end_block: int = 8


class JiTWithTread(JiT):
    config: JiTWithTreadDenoiserConfig

    def __init__(self, config: JiTWithTreadDenoiserConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        assert config.tread_start_block < config.tread_end_block
        assert config.tread_end_block <= config.depth
        super().__init__(config, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.use_tread = config.tread_route_rate > 0

    def __call__(self, image, timestep, context, original_size, target_size,
                 crop_coords, context_mask=None, route_key: jax.Array | None = None):
        cfg = self.config
        height, width = image.shape[1], image.shape[2]
        batch = image.shape[0]
        (
            tokens, context_embed, freqs, kv_lens_full, key_mask_full,
            patches_len, prefix_len,
        ) = self._prepare_inputs(
            image, timestep, context, original_size, target_size, crop_coords,
            context_mask,
        )
        context_len = context_embed.shape[1]
        num_info = prefix_len - patches_len

        patch_tokens = tokens[:, :patches_len, :]
        info_tokens = tokens[:, patches_len:, :]
        context_tokens = context_embed

        patch_freqs = freqs[:patches_len]
        info_freqs = freqs[patches_len:prefix_len]
        context_freqs = freqs[prefix_len : prefix_len + context_len]

        if context_mask is not None:
            ctx_valid = jnp.sum(context_mask.astype(jnp.int32), axis=1)
        else:
            ctx_valid = jnp.full((batch,), context_len, dtype=jnp.int32)

        do_route = self.use_tread and route_key is not None
        route_patch_tokens = None
        route_patch_freqs = None
        inverse_perm = None
        if do_route:
            num_keep = int(patches_len * cfg.tread_route_rate)
            perm = jax.random.permutation(route_key, patches_len)
            keep_idx, route_idx = perm[:num_keep], perm[num_keep:]
            inverse_perm = jnp.argsort(perm)

        for i, block in enumerate(self.blocks):
            if do_route and i == cfg.tread_start_block:
                route_patch_tokens = jnp.take(patch_tokens, route_idx, axis=1)
                route_patch_freqs = jnp.take(patch_freqs, route_idx, axis=0)
                patch_tokens = jnp.take(patch_tokens, keep_idx, axis=1)
                patch_freqs = jnp.take(patch_freqs, keep_idx, axis=0)
            elif do_route and i == cfg.tread_end_block:
                patch_tokens = jnp.take(
                    jnp.concatenate([patch_tokens, route_patch_tokens], axis=1),
                    inverse_perm, axis=1,
                )
                patch_freqs = jnp.take(
                    jnp.concatenate([patch_freqs, route_patch_freqs], axis=0),
                    inverse_perm, axis=0,
                )

            block_tokens = jnp.concatenate(
                [patch_tokens, info_tokens, context_tokens], axis=1
            )
            block_freqs = jnp.concatenate(
                [patch_freqs, info_freqs, context_freqs], axis=0
            )
            cur_patches = patch_tokens.shape[1]
            kv_lens = cur_patches + num_info + ctx_valid

            block_tokens = block(block_tokens, block_freqs, kv_lens=kv_lens)

            patch_tokens = block_tokens[:, :cur_patches, :]
            info_tokens = block_tokens[:, cur_patches : cur_patches + num_info, :]
            if cfg.do_context_fuse:
                context_tokens = block_tokens[:, -context_len:, :]
            else:
                context_tokens = context_embed

        patches = self.final_layer(patch_tokens)
        return self.unpatchify(patches, height, width)


class Denoiser(JiTWithTread):
    pass


class JiTWithTreadConfig(JiTConfig):
    denoiser: JiTWithTreadDenoiserConfig = JiTWithTreadDenoiserConfig()


class JiTWithTreadModel(JiTModel):
    denoiser_class = Denoiser
