"""IP-Adapter: decoupled image cross-attention (rebuild of reference
``src/models/sdxl/adapter/ip_adapter.py`` plus the module layer that is
missing from the reference snapshot — SURVEY §2.3 stale note).

Variants: original, adaln_zero, tanh_gate, gate, flamingo (scalar tanh gate),
time_gate, peft (LoRA-wrapped ip projections). New parameters are
``AdapterParam`` so adapter-only training reuses the PEFT wrt filter.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from pydantic import BaseModel

from ..ops.attention import dot_product_attention
from ..ops.norm import SingleAdaLayerNormZero
from ..peft.config import PeftConfigUnion, RegexMatch
from ..peft.functional import AdapterParam, iter_named_modules
from ..utils.dtype import str_to_dtype
from .util import Adapter, AdapterManager

IPAdapterVariant = Literal[
    "original", "adaln_zero", "peft", "tanh_gate", "gate", "flamingo",
    "time_gate",
]


class ImageEncoderConfig(BaseModel):
    type: str = "transformers"  # "transformers" | "timm"
    model_name: str = "openai/clip-vit-large-patch14"
    feature_dim: int = 1024
    weights_path: str | None = None
    # reference auto.py:18-19
    feature_type: str = "pooler_output"  # "hidden_state" | "pooler_output"
    hidden_state_index: int = -1
    # timm towers only: head count is not recoverable from fused-qkv
    # weights (the embed_dim//64 default is wrong for e.g. ViT-H/14's
    # 16 heads of 80) — set it explicitly for such towers
    num_heads: int | None = None


class IPAdapterConfig(BaseModel):
    """The missing module-layer config, reconstructed from its call sites."""

    variant: IPAdapterVariant = "original"
    ip_scale: float = 1.0
    num_ip_tokens: int = 4
    skip_zero_tokens: bool = False
    attn_renorm: bool = False
    dtype: str = "bfloat16"
    checkpoint_weight: str | None = None

    image_encoder: ImageEncoderConfig = ImageEncoderConfig()
    image_size: int = 224
    background_color: int = 255
    color_channel: str = "rgb"
    image_mean: list[float] = [0.48145466, 0.4578275, 0.40821073]
    image_std: list[float] = [0.26862954, 0.26130258, 0.27577711]

    peft: PeftConfigUnion | None = None
    time_embedding_dim: int = 1280


def retype_to_adapter_params(module: nnx.Module) -> None:
    """Mark every Param in a subtree as AdapterParam (trainable adapter)."""
    for _, mod in iter_named_modules(module):
        for name, value in list(vars(mod).items()):
            if isinstance(value, nnx.Param) and not isinstance(
                value, AdapterParam
            ):
                setattr(mod, name, AdapterParam(value.value))


class ImageProjector(nnx.Module):
    """Classic IP-Adapter ImageProjModel: pooled image feature -> N context
    tokens (linear + LayerNorm)."""

    def __init__(self, image_embed_dim: int, context_dim: int,
                 num_ip_tokens: int, *, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.num_ip_tokens = num_ip_tokens
        self.context_dim = context_dim
        self.proj = nnx.Linear(image_embed_dim, num_ip_tokens * context_dim,
                               dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = nnx.LayerNorm(context_dim, param_dtype=param_dtype,
                                  dtype=dtype, rngs=rngs)
        retype_to_adapter_params(self)

    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        tokens = self.proj(image_embeds).reshape(
            image_embeds.shape[0], self.num_ip_tokens, self.context_dim
        )
        return self.norm(tokens)


class TanhGate(nnx.Module):
    """Flamingo-style zero-init tanh gate (reference ``ip_adapter.py:392-411``)."""

    def __init__(self, dim: int):
        self.weight = AdapterParam(jnp.zeros((dim,), dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        return x * jnp.tanh(self.weight.value).astype(x.dtype)


class Gate(nnx.Module):
    """Plain zero-init multiplicative gate (reference ``ip_adapter.py:536-555``)."""

    def __init__(self, dim: int):
        self.weight = AdapterParam(jnp.zeros((dim,), dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        return x * self.weight.value.astype(x.dtype)


class IPAdapterCrossAttention(Adapter):
    """Decoupled image cross-attention on SDXL attn2
    (reference ``ip_adapter.py:30-257``). Wraps the original (possibly
    quantized / LoRA-wrapped) q/k/v/out and adds to_k_ip/to_v_ip initialized
    from the originals."""

    target_key: RegexMatch = RegexMatch(
        regex=r".*?(denoiser|diffusion_model).*\.attn2$"
    )
    variant: IPAdapterVariant = "original"

    def __init__(self, cross_attention_dim: int, num_heads: int,
                 head_dim: int, to_q, to_k, to_v, to_out,
                 config: IPAdapterConfig, *, rngs: nnx.Rngs | None = None):
        self.cross_attention_dim = cross_attention_dim
        self.inner_dim = num_heads * head_dim
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.ip_scale = config.ip_scale
        self.num_ip_tokens = config.num_ip_tokens
        self.skip_zero_tokens = config.skip_zero_tokens
        self.attn_renorm = config.attn_renorm
        # original (frozen — stays plain Param, outside the wrt filter)
        self.to_q = to_q
        self.to_k = to_k
        self.to_v = to_v
        self.to_out = to_out

        dtype = str_to_dtype(config.dtype)
        # init from the original projections when they're dense
        # (reference ``ip_adapter.py:95-113``); quantized originals get
        # small-normal init
        rngs = rngs or nnx.Rngs(0)
        if hasattr(to_k, "kernel"):
            k_init = to_k.kernel.value.astype(dtype)
            v_init = to_v.kernel.value.astype(dtype)
        else:
            k1, k2 = jax.random.split(rngs.params())
            k_init = (
                jax.random.normal(
                    k1, (cross_attention_dim, self.inner_dim), dtype
                ) * 0.01 - 0.01
            )
            v_init = (
                jax.random.normal(
                    k2, (cross_attention_dim, self.inner_dim), dtype
                ) * 0.01 - 0.01
            )
        self.to_k_ip = AdapterParam(k_init)
        self.to_v_ip = AdapterParam(v_init)
        self._init_extra(config, rngs)

    def _init_extra(self, config: IPAdapterConfig, rngs: nnx.Rngs):
        pass

    def get_module_dict(self) -> dict[str, nnx.Module]:
        return {}

    def get_adapter_state(self) -> dict[str, np.ndarray]:
        """torch-layout adapter-only weights
        (kohya/ip-adapter convention: to_k_ip.weight is (out, in))."""
        out = {
            "to_k_ip.weight": np.asarray(self.to_k_ip.value).T,
            "to_v_ip.weight": np.asarray(self.to_v_ip.value).T,
        }
        out.update(self._extra_state())
        return out

    def load_adapter_state(self, sd: dict[str, np.ndarray]) -> None:
        if (w := sd.get("to_k_ip.weight")) is not None:
            self.to_k_ip.value = jnp.asarray(np.asarray(w).T)
        if (w := sd.get("to_v_ip.weight")) is not None:
            self.to_v_ip.value = jnp.asarray(np.asarray(w).T)
        self._load_extra_state(sd)

    def _extra_state(self) -> dict[str, np.ndarray]:
        return {}

    def _load_extra_state(self, sd: dict[str, np.ndarray]) -> None:
        pass

    @classmethod
    def from_module(cls, module, config: IPAdapterConfig, *,
                    rngs: nnx.Rngs | None = None):
        if hasattr(module, "to_k") and hasattr(module.to_k, "kernel"):
            cross_dim = module.to_k.kernel.value.shape[0]
        else:
            cross_dim = module.to_k.kernel_shape[0]
        return cls(
            cross_attention_dim=cross_dim,
            num_heads=module.num_heads,
            head_dim=module.head_dim,
            to_q=module.to_q,
            to_k=module.to_k,
            to_v=module.to_v,
            to_out=module.to_out,
            config=config,
            rngs=rngs,
        )

    # ----------------------------------------------------------- forward

    def _attend(self, query, key, value, mask=None):
        b, s, _ = query.shape
        sk = key.shape[1]
        q = query.reshape(b, s, self.num_heads, self.head_dim)
        k = key.reshape(b, sk, self.num_heads, self.head_dim)
        v = value.reshape(b, sk, self.num_heads, self.head_dim)
        attn = dot_product_attention(q, k, v, mask=mask)
        return attn.astype(query.dtype).reshape(b, s, self.inner_dim)

    @staticmethod
    def _renorm(original, new):
        o = jnp.linalg.norm(original, axis=-1, keepdims=True)
        n = jnp.linalg.norm(new, axis=-1, keepdims=True)
        return new * (o / jnp.maximum(n, 1e-12))

    def _ip_kv(self, ip_tokens):
        dt = self.to_k_ip.value.dtype
        return (
            ip_tokens.astype(dt) @ self.to_k_ip.value,
            ip_tokens.astype(dt) @ self.to_v_ip.value,
        )

    def _gate(self, ip_hidden_states, time_embedding):
        return ip_hidden_states  # overridden by gated variants

    def __call__(self, query, context, mask=None, time_embedding=None,
                 ip_tokens=None, ip_mask=None, **kwargs):
        q = self.to_q(query)
        text_k = self.to_k(context)
        text_v = self.to_v(context)
        hidden_states = self._attend(q, text_k, text_v, mask=mask)
        if ip_tokens is not None:
            ip_k, ip_v = self._ip_kv(ip_tokens)
            ip_hidden = self._attend(q, ip_k.astype(q.dtype),
                                     ip_v.astype(q.dtype), mask=ip_mask)
            ip_hidden = self._gate(ip_hidden, time_embedding)
            new = hidden_states + self.ip_scale * ip_hidden
            if self.attn_renorm:
                hidden_states = self._renorm(hidden_states, new)
            else:
                hidden_states = new
        return self.to_out(hidden_states)


class IPAdapterCrossAttentionAdaLNZero(IPAdapterCrossAttention):
    """ip tokens modulated by time AdaLN-Zero; arrive as the context tail
    (reference ``ip_adapter.py:260-389``)."""

    variant = "adaln_zero"

    def _init_extra(self, config, rngs):
        self.norm = SingleAdaLayerNormZero(
            hidden_dim=self.cross_attention_dim,
            gate_dim=self.inner_dim,
            embedding_dim=config.time_embedding_dim,
            rngs=rngs,
        )
        retype_to_adapter_params(self.norm)

    def __call__(self, query, context, mask=None, time_embedding=None,
                 ip_tokens=None, ip_mask=None, **kwargs):
        assert time_embedding is not None, "AdaLN-Zero needs time_embedding"
        if ip_tokens is None:
            # reference packs ip tokens at the context tail
            ip_tokens = context[:, -self.num_ip_tokens:, :]
            context = context[:, : -self.num_ip_tokens, :]
        q = self.to_q(query)
        hidden_states = self._attend(
            q, self.to_k(context), self.to_v(context), mask=mask
        )
        normed_ip, _scale, _shift, gate = self.norm(ip_tokens, time_embedding)
        ip_k, ip_v = self._ip_kv(normed_ip)
        ip_hidden = self._attend(q, ip_k.astype(q.dtype), ip_v.astype(q.dtype))
        ip_hidden = ip_hidden * gate[:, None, :].astype(ip_hidden.dtype)
        hidden_states = hidden_states + self.ip_scale * ip_hidden
        return self.to_out(hidden_states)

    def _extra_state(self):
        from ..utils.state_dict import flatten_state

        return {
            f"norm.{k}": np.asarray(v)
            for k, v in flatten_state(self.norm).items()
        }

    def _load_extra_state(self, sd):
        from ..utils.state_dict import load_flat_state

        sub = {k[len("norm."):]: v for k, v in sd.items()
               if k.startswith("norm.")}
        if sub:
            load_flat_state(self.norm, sub, strict=False)


class IPAdapterCrossAttentionTanhGate(IPAdapterCrossAttention):
    variant = "tanh_gate"

    def _init_extra(self, config, rngs):
        self.tanh_gate = TanhGate(self.inner_dim)

    def _gate(self, ip_hidden_states, time_embedding):
        return self.tanh_gate(ip_hidden_states)

    def _extra_state(self):
        return {"tanh_gate.weight": np.asarray(self.tanh_gate.weight.value)}

    def _load_extra_state(self, sd):
        if (w := sd.get("tanh_gate.weight")) is not None:
            self.tanh_gate.weight.value = jnp.asarray(w)


class IPAdapterCrossAttentionGate(IPAdapterCrossAttention):
    variant = "gate"

    def _init_extra(self, config, rngs):
        self.gate = Gate(self.inner_dim)

    def _gate(self, ip_hidden_states, time_embedding):
        return self.gate(ip_hidden_states)

    def _extra_state(self):
        return {"gate.weight": np.asarray(self.gate.weight.value)}

    def _load_extra_state(self, sd):
        if (w := sd.get("gate.weight")) is not None:
            self.gate.weight.value = jnp.asarray(w)


class IPAdapterCrossAttentionFlamingoGate(IPAdapterCrossAttentionTanhGate):
    """Scalar tanh gate (reference ``ip_adapter.py:682-713``)."""

    variant = "flamingo"

    def _init_extra(self, config, rngs):
        self.tanh_gate = TanhGate(1)


class IPAdapterCrossAttentionTimeGate(IPAdapterCrossAttention):
    """Zero-init Linear(time) gate (reference ``ip_adapter.py:715-842``)."""

    variant = "time_gate"

    def _init_extra(self, config, rngs):
        self.time_gate_kernel = AdapterParam(
            jnp.zeros((config.time_embedding_dim, self.inner_dim),
                      dtype=jnp.float32)
        )
        self.time_gate_bias = AdapterParam(
            jnp.zeros((self.inner_dim,), dtype=jnp.float32)
        )

    def _gate(self, ip_hidden_states, time_embedding):
        gate = (
            time_embedding.astype(jnp.float32) @ self.time_gate_kernel.value
            + self.time_gate_bias.value
        )
        return ip_hidden_states * gate[:, None, :].astype(ip_hidden_states.dtype)

    def _extra_state(self):
        return {
            "time_gate.weight": np.asarray(self.time_gate_kernel.value).T,
            "time_gate.bias": np.asarray(self.time_gate_bias.value),
        }

    def _load_extra_state(self, sd):
        if (w := sd.get("time_gate.weight")) is not None:
            self.time_gate_kernel.value = jnp.asarray(np.asarray(w).T)
        if (b := sd.get("time_gate.bias")) is not None:
            self.time_gate_bias.value = jnp.asarray(b)


class IPAdapterCrossAttentionPeft(IPAdapterCrossAttention):
    """LoRA-wrapped ip projections (reference ``ip_adapter.py:844-992``)."""

    variant = "peft"

    def _init_extra(self, config, rngs):
        from ..peft.lora import LoRALinear

        assert config.peft is not None, "peft variant needs a peft config"
        base_k = nnx.Linear(self.cross_attention_dim, self.inner_dim,
                            use_bias=False, rngs=rngs)
        base_v = nnx.Linear(self.cross_attention_dim, self.inner_dim,
                            use_bias=False, rngs=rngs)
        base_k.kernel.value = self.to_k_ip.value.astype(
            base_k.kernel.value.dtype
        )
        base_v.kernel.value = self.to_v_ip.value.astype(
            base_v.kernel.value.dtype
        )
        self.to_k_ip_lora = LoRALinear(config.peft, base_k, rngs=rngs)
        self.to_v_ip_lora = LoRALinear(config.peft, base_v, rngs=rngs)

    def _ip_kv(self, ip_tokens):
        return self.to_k_ip_lora(ip_tokens), self.to_v_ip_lora(ip_tokens)

    def _extra_state(self):
        out = {}
        for name, lora in (("to_k_ip", self.to_k_ip_lora),
                           ("to_v_ip", self.to_v_ip_lora)):
            for k, v in lora.get_adapter_weights().items():
                out[f"{name}.{k}"] = v
        return out

    def _load_extra_state(self, sd):
        for name, lora in (("to_k_ip", self.to_k_ip_lora),
                           ("to_v_ip", self.to_v_ip_lora)):
            sub = {k[len(name) + 1:]: v for k, v in sd.items()
                   if k.startswith(name + ".")}
            if sub:
                lora.load_weights(sub)


_VARIANTS: dict[str, type[IPAdapterCrossAttention]] = {
    "original": IPAdapterCrossAttention,
    "adaln_zero": IPAdapterCrossAttentionAdaLNZero,
    "tanh_gate": IPAdapterCrossAttentionTanhGate,
    "gate": IPAdapterCrossAttentionGate,
    "flamingo": IPAdapterCrossAttentionFlamingoGate,
    "time_gate": IPAdapterCrossAttentionTimeGate,
    "peft": IPAdapterCrossAttentionPeft,
}


def get_ip_adapter_class(variant: IPAdapterVariant):
    try:
        return _VARIANTS[variant]
    except KeyError:
        raise ValueError(
            f"Unknown adapter variant: {variant}. Supported: "
            f"{sorted(_VARIANTS)}"
        ) from None


class IPAdapterManager(AdapterManager):
    """Reference's missing manager layer; adds the image projector factory."""

    def __init__(self, adapter_class=None, adapter_config: IPAdapterConfig | None = None):
        config = adapter_config or IPAdapterConfig()
        adapter_class = adapter_class or get_ip_adapter_class(config.variant)
        super().__init__(adapter_class, config)

    def get_projector(self, attention_dim: int, *,
                      rngs: nnx.Rngs | None = None) -> ImageProjector:
        return ImageProjector(
            image_embed_dim=self.adapter_config.image_encoder.feature_dim,
            context_dim=attention_dim,
            num_ip_tokens=self.adapter_config.num_ip_tokens,
            rngs=rngs or nnx.Rngs(0),
        )
