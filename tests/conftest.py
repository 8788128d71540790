"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend, so this lives at the top
of conftest (pytest imports it before any test module).
"""

import os

# The environment exports JAX_PLATFORMS=axon (real TPU); tests must run on a
# virtual CPU mesh. NOTE: the axon plugin ignores the JAX_PLATFORMS env var —
# only jax.config.update("jax_platforms", ...) works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-dominated (tiny models,
# many jit shapes); repeat runs reuse compiled executables across processes
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform}"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
