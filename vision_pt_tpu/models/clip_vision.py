"""JAX CLIP vision tower (HF ``CLIPVisionModel`` analog), the image encoder
behind IP-Adapter / PFG / style-tokenizer (reference ``src/models/auto.py``
builds it via ``transformers.AutoModel``).

Parameter paths mirror HF (``vision_model.embeddings.patch_embedding`` etc.,
including HF's ``pre_layrnorm`` typo) so local safetensors load directly.
Semantics follow ``transformers CLIPVisionTransformer.forward``: pooled
output = post_layernorm(cls token); last_hidden_state WITHOUT the post norm;
all hidden states retained for ``hidden_state_index`` feature extraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from pydantic import BaseModel

from ..ops.attention import dot_product_attention


class CLIPVisionConfig(BaseModel):
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # "quick_gelu" for ViT-L
    projection_dim: int = 1024


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPVisionEmbeddings(nnx.Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        d = config.hidden_size
        self.class_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (d,), param_dtype) * 0.02
        )
        self.patch_embedding = nnx.Conv(
            config.num_channels, d,
            kernel_size=(config.patch_size, config.patch_size),
            strides=(config.patch_size, config.patch_size),
            use_bias=False, padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        num_pos = (config.image_size // config.patch_size) ** 2 + 1
        self.position_embedding = nnx.Embed(
            num_pos, d, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: (B, H, W, 3) NHWC (TPU conv-native)."""
        b = pixel_values.shape[0]
        patches = self.patch_embedding(pixel_values)  # (B, gh, gw, D)
        patches = patches.reshape(b, -1, patches.shape[-1])
        cls = jnp.broadcast_to(
            self.class_embedding.value[None, None, :],
            (b, 1, patches.shape[-1]),
        ).astype(patches.dtype)
        x = jnp.concatenate([cls, patches], axis=1)
        pos = jnp.arange(x.shape[1])[None]
        return x + self.position_embedding(pos)


class CLIPVisionMLP(nnx.Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(config.hidden_size, config.intermediate_size,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc2 = nnx.Linear(config.intermediate_size, config.hidden_size,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.act = _act(config.hidden_act)

    def __call__(self, x):
        return self.fc2(self.act(self.fc1(x)))


class CLIPVisionAttention(nnx.Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = nnx.Linear(d, d, **kw)
        self.k_proj = nnx.Linear(d, d, **kw)
        self.v_proj = nnx.Linear(d, d, **kw)
        self.out_proj = nnx.Linear(d, d, **kw)

    def __call__(self, x):
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        attn = dot_product_attention(q, k, v)
        return self.out_proj(attn.astype(x.dtype).reshape(b, s, -1))


class CLIPVisionLayer(nnx.Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        eps = config.layer_norm_eps
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.self_attn = CLIPVisionAttention(config, **kw)
        self.layer_norm1 = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                         param_dtype=param_dtype, dtype=dtype,
                                         rngs=rngs)
        self.mlp = CLIPVisionMLP(config, **kw)
        self.layer_norm2 = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                         param_dtype=param_dtype, dtype=dtype,
                                         rngs=rngs)

    def __call__(self, x):
        x = x + self.self_attn(self.layer_norm1(x))
        return x + self.mlp(self.layer_norm2(x))


class CLIPVisionOutput(NamedTuple):
    last_hidden_state: jax.Array
    pooler_output: jax.Array
    hidden_states: tuple[jax.Array, ...]  # embeddings + after each layer
    image_embeds: jax.Array | None  # projected pooled (WithProjection)


class VisionTransformer(nnx.Module):
    """HF ``CLIPVisionModel.vision_model`` analog."""

    def __init__(self, config: CLIPVisionConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        eps = config.layer_norm_eps
        self.embeddings = CLIPVisionEmbeddings(config, **kw)
        # HF's actual (typo'd) parameter name — kept for key compatibility
        self.pre_layrnorm = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                          param_dtype=param_dtype,
                                          dtype=dtype, rngs=rngs)
        self.layers = nnx.List([
            CLIPVisionLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.post_layernorm = nnx.LayerNorm(config.hidden_size, epsilon=eps,
                                            param_dtype=param_dtype,
                                            dtype=dtype, rngs=rngs)


class CLIPVisionModel(nnx.Module):
    """JAX CLIP vision encoder; optional projection head."""

    def __init__(self, config: CLIPVisionConfig,
                 with_projection: bool = False, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        self.vision_model = VisionTransformer(
            config, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.visual_projection = (
            nnx.Linear(config.hidden_size, config.projection_dim,
                       use_bias=False, dtype=dtype, param_dtype=param_dtype,
                       rngs=rngs)
            if with_projection else None
        )

    def __call__(self, pixel_values: jax.Array) -> CLIPVisionOutput:
        vm = self.vision_model
        x = vm.embeddings(pixel_values)
        x = vm.pre_layrnorm(x)
        hidden_states = [x]
        for layer in vm.layers:
            x = layer(x)
            hidden_states.append(x)
        pooled = vm.post_layernorm(x[:, 0, :])
        image_embeds = (
            self.visual_projection(pooled)
            if self.visual_projection is not None else None
        )
        return CLIPVisionOutput(
            last_hidden_state=x,
            pooler_output=pooled,
            hidden_states=tuple(hidden_states),
            image_embeds=image_embeds,
        )

    @classmethod
    def from_local(cls, path: str, with_projection: bool = False, *,
                   dtype=None, rngs: nnx.Rngs | None = None
                   ) -> "CLIPVisionModel":
        """Load from a local HF directory (config.json + safetensors)."""
        import json
        from pathlib import Path

        from safetensors.numpy import load_file

        from ..utils.state_dict import load_flat_state

        d = Path(path)
        hf = json.loads((d / "config.json").read_text())
        hf = hf.get("vision_config", hf)
        config = CLIPVisionConfig(
            hidden_size=hf.get("hidden_size", 1280),
            intermediate_size=hf.get("intermediate_size", 5120),
            num_hidden_layers=hf.get("num_hidden_layers", 32),
            num_attention_heads=hf.get("num_attention_heads", 16),
            image_size=hf.get("image_size", 224),
            patch_size=hf.get("patch_size", 14),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            hidden_act=hf.get("hidden_act", "gelu"),
            projection_dim=hf.get("projection_dim", 1024),
        )
        model = cls(config, with_projection=with_projection, dtype=dtype,
                    rngs=rngs or nnx.Rngs(0))
        sd: dict[str, np.ndarray] = {}
        for f in sorted(d.glob("*.safetensors")):
            sd |= load_file(str(f))
        load_flat_state(model, convert_hf_clip_vision(sd), strict=False)
        return model


def convert_hf_clip_vision(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """HF torch-layout CLIP vision state dict -> NNX flat dict."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        k = k.removeprefix("clip.")  # some exports nest
        if not (k.startswith("vision_model.") or
                k.startswith("visual_projection")):
            continue
        k = k.replace(".encoder.layers.", ".layers.")
        if k.endswith("position_embedding.weight"):
            out[k[: -len(".weight")] + ".embedding"] = v
        elif k.endswith("patch_embedding.weight"):
            # torch conv OIHW -> flax HWIO
            out[k[: -len(".weight")] + ".kernel"] = v.transpose(2, 3, 1, 0)
        elif k.endswith(".weight") and v.ndim == 2:
            out[k[: -len(".weight")] + ".kernel"] = v.T
        elif k.endswith(".weight") and v.ndim == 1:
            out[k[: -len(".weight")] + ".scale"] = v
        else:
            out[k] = v
    return out
