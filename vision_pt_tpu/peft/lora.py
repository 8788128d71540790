"""LoRA adapter layers (rebuild of reference ``src/modules/peft/lora.py``).

JAX shape: adapter params are a distinct Variable type (``AdapterParam``), so
"freeze the base" is simply differentiating/updating w.r.t. AdapterParam — no
requires_grad bookkeeping. Kernel layouts are NNX (in, out); export/import to
kohya-style torch layouts transposes at the state-dict boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..utils.dtype import str_to_dtype
from .config import LoRAConfig
from .functional import AdapterParam, PeftConst, PeftLayer


class LoRALinear(PeftLayer):
    """y = W x + (alpha/rank) * up(down(dropout(x)))
    (reference ``lora.py:19-164``).

    down init kaiming-uniform, up init zeros (torchtune-style, reference
    ``lora.py:67-80``); alpha saved as a non-trainable scalar so checkpoints
    carry the scaling.
    """

    adapter_param_names = ["lora_up", "lora_down", "alpha"]
    adapter_weight_names = [
        "lora_up.weight",
        "lora_up.bias",
        "lora_down.weight",
        "alpha",
    ]

    def __init__(
        self,
        config: LoRAConfig,
        original_linear: nnx.Linear,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        self.config = config
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        dtype = str_to_dtype(config.dtype)
        # plain nnx.Linear has .kernel; quantized linears expose kernel_shape
        if hasattr(original_linear, "kernel_shape"):
            in_features, out_features = original_linear.kernel_shape
        else:
            in_features, out_features = original_linear.kernel.value.shape
        self.rank = config.rank
        self.enabled = True
        self.dropout_rate = config.dropout

        # kaiming uniform on (rank, in) torch layout == same bound either way
        bound = float(np.sqrt(6.0 / in_features))
        self.lora_down = AdapterParam(
            jax.random.uniform(
                rngs.params(), (in_features, config.rank), dtype, -bound, bound
            )
        )
        self.lora_up = AdapterParam(
            jnp.zeros((config.rank, out_features), dtype=dtype)
        )
        self.lora_up_bias = (
            AdapterParam(jnp.zeros((out_features,), dtype=dtype))
            if config.use_bias
            else None
        )
        self.alpha = PeftConst(jnp.asarray(config.alpha, dtype=dtype))
        self.dropout_rngs = rngs if config.dropout > 0 else None

        self.linear = original_linear

    def set_enabled(self, enabled: bool):
        self.enabled = enabled

    def __call__(self, x: jax.Array) -> jax.Array:
        original = self.linear(x)
        if not self.enabled:
            return original
        h = x
        if self.dropout_rate > 0 and self.dropout_rngs is not None:
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(
                self.dropout_rngs.dropout(), keep, x.shape
            )
            h = jnp.where(mask, x / keep, 0.0)
        h = h.astype(self.lora_down.value.dtype)
        down = h @ self.lora_down.value
        up = down @ self.lora_up.value
        if self.lora_up_bias is not None:
            up = up + self.lora_up_bias.value
        scale = (self.alpha.value / self.rank).astype(up.dtype)
        return original + (up * scale).astype(original.dtype)

    # ------------------------------------------------------- weights IO

    def get_adapter_weights(self) -> dict[str, np.ndarray]:
        """kohya/torch-layout adapter weights."""
        out = {
            "lora_down.weight": np.asarray(self.lora_down.value).T,
            "lora_up.weight": np.asarray(self.lora_up.value).T,
            "alpha": np.asarray(self.alpha.value),
        }
        if self.lora_up_bias is not None:
            out["lora_up.bias"] = np.asarray(self.lora_up_bias.value)
        return out

    def load_weights(self, adapter_weights: dict[str, np.ndarray | None]):
        if (w := adapter_weights.get("lora_down.weight")) is not None:
            self.lora_down.value = jnp.asarray(np.asarray(w).T)
        if (w := adapter_weights.get("lora_up.weight")) is not None:
            self.lora_up.value = jnp.asarray(np.asarray(w).T)
        if (w := adapter_weights.get("lora_up.bias")) is not None:
            self.lora_up_bias = AdapterParam(jnp.asarray(w))
        if (w := adapter_weights.get("alpha")) is not None:
            self.alpha.value = jnp.asarray(w)
            self.rank = int(self.lora_down.value.shape[1])

    @classmethod
    def from_weights(
        cls,
        adapter_weights: dict[str, np.ndarray],
        original_layer: nnx.Linear,
    ) -> "LoRALinear":
        rank = int(np.asarray(adapter_weights["lora_down.weight"]).shape[0])
        alpha = float(np.asarray(adapter_weights["alpha"]))
        config = LoRAConfig(rank=rank, alpha=alpha)
        module = cls(config, original_layer)
        module.load_weights(adapter_weights)
        return module

    def merged_kernel(self) -> jax.Array:
        """W + (alpha/rank) * down @ up, for merged export/inference."""
        delta = (
            self.lora_down.value.astype(jnp.float32)
            @ self.lora_up.value.astype(jnp.float32)
        ) * (self.alpha.value.astype(jnp.float32) / self.rank)
        return self.linear.kernel.value + delta.astype(
            self.linear.kernel.value.dtype
        )
