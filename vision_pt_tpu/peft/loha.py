"""LoHa adapter (rebuild of reference ``src/modules/peft/loha.py``; LyCORIS
Hadamard-product low-rank adaptation).

delta_W = (w1_a @ w1_b) * (w2_a @ w2_b), applied as x @ delta_W — the
reference stores (in, rank)/(rank, out) factors and transposes for F.linear;
in NNX layout no transpose is needed at apply time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..utils.dtype import str_to_dtype
from .config import LoHaConfig
from .functional import AdapterParam, PeftConst, PeftLayer


class LoHaLinear(PeftLayer):
    adapter_param_names = ["hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b", "alpha"]
    adapter_weight_names = [
        "hada_w1_a",
        "hada_w1_b",
        "hada_w2_a",
        "hada_w2_b",
        "alpha",
    ]

    def __init__(
        self,
        config: LoHaConfig,
        original_linear: nnx.Linear,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        self.config = config
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        dtype = str_to_dtype(config.dtype)
        if hasattr(original_linear, "kernel_shape"):
            in_features, out_features = original_linear.kernel_shape
        else:
            in_features, out_features = original_linear.kernel.value.shape
        self.rank = config.rank
        self.enabled = True
        self.dropout_rate = config.dropout

        # init per reference ``loha.py:85-95``: w1_b ~ N(0,1), w1_a ~ N(0,0.1),
        # w2_b ~ N(0,1), w2_a = 0 (so delta starts at zero)
        k1, k2, k3 = jax.random.split(rngs.params(), 3)
        self.hada_w1_a = AdapterParam(
            jax.random.normal(k1, (in_features, config.rank), dtype) * 0.1
        )
        self.hada_w1_b = AdapterParam(
            jax.random.normal(k2, (config.rank, out_features), dtype)
        )
        self.hada_w2_a = AdapterParam(
            jnp.zeros((in_features, config.rank), dtype=dtype)
        )
        self.hada_w2_b = AdapterParam(
            jax.random.normal(k3, (config.rank, out_features), dtype)
        )
        self.alpha = PeftConst(jnp.asarray(config.alpha, dtype=dtype))
        self.linear = original_linear

    def set_enabled(self, enabled: bool):
        self.enabled = enabled

    def __call__(self, x: jax.Array) -> jax.Array:
        original = self.linear(x)
        if not self.enabled:
            return original
        w1 = self.hada_w1_a.value @ self.hada_w1_b.value  # (in, out)
        w2 = self.hada_w2_a.value @ self.hada_w2_b.value
        delta = w1 * w2
        scale = (self.alpha.value / self.rank).astype(delta.dtype)
        out = x.astype(delta.dtype) @ delta * scale
        return original + out.astype(original.dtype)

    # ------------------------------------------------------- weights IO

    def get_adapter_weights(self) -> dict[str, np.ndarray]:
        return {
            "hada_w1_a": np.asarray(self.hada_w1_a.value),
            "hada_w1_b": np.asarray(self.hada_w1_b.value),
            "hada_w2_a": np.asarray(self.hada_w2_a.value),
            "hada_w2_b": np.asarray(self.hada_w2_b.value),
            "alpha": np.asarray(self.alpha.value),
        }

    def load_weights(self, adapter_weights: dict[str, np.ndarray | None]):
        for name in ("hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b"):
            if (w := adapter_weights.get(name)) is not None:
                getattr(self, name).value = jnp.asarray(w)
        if (w := adapter_weights.get("alpha")) is not None:
            self.alpha.value = jnp.asarray(w)
        self.rank = int(self.hada_w1_a.value.shape[1])

    @classmethod
    def from_weights(
        cls,
        adapter_weights: dict[str, np.ndarray],
        original_layer: nnx.Linear,
    ) -> "LoHaLinear":
        rank = int(np.asarray(adapter_weights["hada_w1_a"]).shape[1])
        alpha = float(np.asarray(adapter_weights["alpha"]))
        config = LoHaConfig(rank=rank, alpha=alpha)
        module = cls(config, original_layer)
        module.load_weights(adapter_weights)
        return module
