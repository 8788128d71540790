"""timm-layout Vision Transformer (local-weights tower for AutoImageEncoder).

The reference's ``AutoImageEncoder`` accepts any timm tower
(``/root/reference/src/models/auto.py:64-148``) — used by the
``ip_adapter.kyara`` workload with non-CLIP ViTs. This is a JAX rebuild of
the plain timm ``vision_transformer`` family (ViT/DeiT/DINOv2-style):
fused-qkv pre-norm blocks, optional LayerScale, cls-token or mean pooling.

Loading is weight-driven: every architectural dimension (depth, width,
heads*, patch size, grid, LayerScale, pooling) is inferred from the
checkpoint's ``blocks.N.*`` key layout itself, so any safetensors file saved
from ``timm.create_model(...).state_dict()`` loads without a config file.
(*head count isn't recoverable from fused qkv shapes; default 64-d heads,
overridable.)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pydantic import BaseModel

import jax
import jax.numpy as jnp
from flax import nnx


class TimmViTConfig(BaseModel):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    img_size: int = 224
    mlp_ratio: float = 4.0
    class_token: bool = True
    global_pool: str = "token"  # "token" (cls) | "avg"
    use_layer_scale: bool = False
    layer_norm_eps: float = 1e-6


class TimmAttention(nnx.Module):
    """timm ``Attention``: fused qkv Linear + output proj."""

    def __init__(self, dim: int, num_heads: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nnx.Linear(dim, dim * 3, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.proj = nnx.Linear(dim, dim, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))
        from ..ops.attention import dot_product_attention

        out = dot_product_attention(q, k, v)
        return self.proj(out.reshape(b, n, d))


class TimmMlp(nnx.Module):
    def __init__(self, dim: int, hidden: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(dim, hidden, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.fc2 = nnx.Linear(hidden, dim, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(x), approximate=False))


class TimmBlock(nnx.Module):
    """Pre-norm residual block; optional LayerScale (DINOv2 ``ls1/ls2``)."""

    def __init__(self, config: TimmViTConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        d = config.embed_dim
        eps = config.layer_norm_eps
        self.norm1 = nnx.LayerNorm(d, epsilon=eps, dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)
        self.attn = TimmAttention(d, config.num_heads, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d, epsilon=eps, dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)
        self.mlp = TimmMlp(d, int(d * config.mlp_ratio), dtype=dtype,
                           param_dtype=param_dtype, rngs=rngs)
        if config.use_layer_scale:
            self.ls1 = nnx.Param(jnp.ones((d,), dtype=param_dtype))
            self.ls2 = nnx.Param(jnp.ones((d,), dtype=param_dtype))
        else:
            self.ls1 = None
            self.ls2 = None

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.attn(self.norm1(x))
        if self.ls1 is not None:
            h = h * self.ls1.value
        x = x + h
        h = self.mlp(self.norm2(x))
        if self.ls2 is not None:
            h = h * self.ls2.value
        return x + h


class TimmViTOutput(NamedTuple):
    pooler_output: jax.Array  # (B, D)
    last_hidden_state: jax.Array  # (B, N[+1], D), final-norm applied
    hidden_states: tuple[jax.Array, ...]  # per-block outputs (pre final norm)


class TimmViT(nnx.Module):
    """timm ``VisionTransformer`` with the classifier head removed (the
    reference calls ``reset_classifier(0)``, ``auto.py:77,90``)."""

    def __init__(self, config: TimmViTConfig, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.config = config
        d = config.embed_dim
        grid = config.img_size // config.patch_size
        n_prefix = 1 if config.class_token else 0
        self.patch_embed_proj = nnx.Conv(
            3, d, kernel_size=(config.patch_size, config.patch_size),
            strides=(config.patch_size, config.patch_size), padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.cls_token = (
            nnx.Param(jnp.zeros((1, 1, d), dtype=param_dtype))
            if config.class_token else None
        )
        self.pos_embed = nnx.Param(
            0.02 * jax.random.normal(
                rngs.params(), (1, grid * grid + n_prefix, d)
            ).astype(param_dtype)
        )
        self.blocks = nnx.List([
            TimmBlock(config, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            for _ in range(config.depth)
        ])
        self.norm = nnx.LayerNorm(d, epsilon=config.layer_norm_eps,
                                  dtype=dtype, param_dtype=param_dtype,
                                  rngs=rngs)

    def __call__(self, pixel_values: jax.Array) -> TimmViTOutput:
        """pixel_values: (B, H, W, 3), already normalized."""
        x = self.patch_embed_proj(pixel_values)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        if self.cls_token is not None:
            cls = jnp.broadcast_to(self.cls_token.value, (b, 1, d))
            x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        x = x + self.pos_embed.value.astype(x.dtype)
        hidden_states = []
        for block in self.blocks:
            x = block(x)
            hidden_states.append(x)
        x = self.norm(x)
        if self.config.global_pool == "avg":
            n_prefix = 1 if self.cls_token is not None else 0
            pooled = jnp.mean(x[:, n_prefix:], axis=1)
        else:
            pooled = x[:, 0]
        return TimmViTOutput(pooled, x, tuple(hidden_states))

    @classmethod
    def from_local(cls, path: str, *, num_heads: int | None = None,
                   dtype=None) -> "TimmViT":
        """Load from a directory of timm-layout safetensors (or one file).
        Shapes drive the architecture; see module docstring."""
        from pathlib import Path

        from safetensors.numpy import load_file

        p = Path(path)
        files = [p] if p.is_file() else sorted(p.glob("*.safetensors"))
        sd: dict[str, np.ndarray] = {}
        for f in files:
            sd |= load_file(str(f))
        if not any(k.startswith("blocks.0.") for k in sd):
            raise ValueError(f"{path} does not hold a timm-layout ViT "
                             "(no blocks.N.* keys)")
        config = infer_timm_vit_config(sd, num_heads=num_heads)
        model = cls(config, dtype=dtype, rngs=nnx.Rngs(0))
        from ..utils.state_dict import load_flat_state

        load_flat_state(model, convert_timm_vit(sd), strict=False)
        return model


def infer_timm_vit_config(sd: dict[str, np.ndarray],
                          num_heads: int | None = None) -> TimmViTConfig:
    """Recover the architecture from a timm state dict's shapes."""
    conv = sd["patch_embed.proj.weight"]  # (D, 3, P, P) torch OIHW
    embed_dim, _, patch, _ = conv.shape
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    hidden = sd["blocks.0.mlp.fc1.weight"].shape[0]
    class_token = "cls_token" in sd
    n_pos = sd["pos_embed"].shape[1] - (1 if class_token else 0)
    grid = int(round(n_pos ** 0.5))
    if num_heads is None:
        # fused qkv hides the head count; 64-d heads is the timm-family norm
        num_heads = max(1, embed_dim // 64)
    return TimmViTConfig(
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        patch_size=patch,
        img_size=grid * patch,
        mlp_ratio=hidden / embed_dim,
        class_token=class_token,
        global_pool="token" if class_token else "avg",
        use_layer_scale="blocks.0.ls1.gamma" in sd,
    )


def convert_timm_vit(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """timm torch-layout state dict -> NNX flat dict."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "patch_embed.proj.weight":  # OIHW -> HWIO
            out["patch_embed_proj.kernel"] = v.transpose(2, 3, 1, 0)
        elif k == "patch_embed.proj.bias":
            out["patch_embed_proj.bias"] = v
        elif k in ("cls_token", "pos_embed"):
            out[k] = v
        elif k.endswith(".ls1.gamma") or k.endswith(".ls2.gamma"):
            out[k[: -len(".gamma")]] = v
        elif k.endswith(".weight") and v.ndim == 2:
            out[k[: -len(".weight")] + ".kernel"] = v.T
        elif ".norm" in k and k.endswith(".weight"):
            out[k[: -len(".weight")] + ".scale"] = v
        elif k.startswith("norm.") and k.endswith("weight"):
            out["norm.scale"] = v
        elif k.endswith(".bias") or k.endswith(".weight"):
            out[k] = v
        # classifier head (head.*) intentionally dropped: reset_classifier(0)
    return out
