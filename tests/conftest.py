"""Test configuration: run the suite on a virtual 8-device CPU mesh in f64.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8`.  f64 on CPU is the numerical
oracle mode — the TPU path runs f32 and is verified against it.

NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so the platform must be forced via jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Installs the big-stack compile-cache IO patch (XLA's (de)serializer
# overflows the 8MB main stack on large executables) before any compile.
import ba_tpu  # noqa: E402,F401
