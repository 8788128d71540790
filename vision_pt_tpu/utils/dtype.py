"""dtype string parsing (rebuild of reference ``src/utils/dtype.py``)."""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "half": jnp.float16,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "fp8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
    "int8": jnp.int8,
    "int4": jnp.int4,
    "int32": jnp.int32,
    "int64": jnp.int64,
}


def str_to_dtype(name: str) -> jnp.dtype:
    key = name.lower().removeprefix("torch.").removeprefix("jnp.")
    if key not in _DTYPES:
        raise ValueError(f"Unknown dtype string: {name}")
    return _DTYPES[key]


def dtype_to_str(dtype: jnp.dtype) -> str:
    return jnp.dtype(dtype).name
