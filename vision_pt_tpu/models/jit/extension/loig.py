"""Low-rank Internal Guidance JiT.

Rebuild of reference ``src/models/jit/extension/loig.py``: a second,
rank-``internal_rank`` bottleneck final layer on the LAST hidden state;
forward returns (pred, weak_pred); generate blends like IG.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ..config import DenoiserConfig, JiTConfig
from ..denoiser import BottleneckFinalLayer, JiT
from ..pipeline import JiTModel
from .ig import IGGenerateMixin


class LoIGJiTDenoiserConfig(DenoiserConfig):
    internal_rank: int = 16


class LoIGJiT(JiT):
    """Reference ``loig.py:21-205``."""

    def __init__(self, config: LoIGJiTDenoiserConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.low_rank_final_layer = BottleneckFinalLayer(
            hidden_dim=config.hidden_size,
            bottleneck_dim=config.internal_rank,
            patch_size=config.patch_size,
            out_channels=config.out_channels,
            norm_type="rms",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
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

        patches = tokens[:, :patches_len, :]
        pred = self.unpatchify(self.final_layer(patches), height, width)
        weak = self.unpatchify(self.low_rank_final_layer(patches), height, width)
        return pred, weak


class Denoiser(LoIGJiT):
    pass


class LoIGJiTConfig(JiTConfig):
    denoiser: LoIGJiTDenoiserConfig = LoIGJiTDenoiserConfig()


class LoIGJiTModel(IGGenerateMixin, JiTModel):
    denoiser_class = Denoiser
