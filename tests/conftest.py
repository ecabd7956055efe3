"""Test harness: CPU backend with 8 virtual devices and float64 enabled.

Unit tests run against the book-scenario oracles in float64 (the
reference is all-f64 Rust); the TPU path uses float32 with relaxed
tolerances. Multi-device sharding tests use the virtual CPU mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator platform (e.g. a TPU
# tunnel) and force it via JAX_PLATFORMS before conftest runs; unit tests
# need CPU for float64 + the 8-device virtual mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
