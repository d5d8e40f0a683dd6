"""Root test-harness configuration (applies to tests/ AND doctest
collection of flacx/ modules via --doctest-modules).

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding path is exercised without TPU hardware (the codec analogue of
multi-node tests without a cluster).  Must run before jax is imported
anywhere.
"""

import os

# Force the CPU backend with 8 virtual devices.  NB: some environments
# preload jax and register a TPU PJRT plugin via sitecustomize, so plain
# env vars can be too late — the jax.config API below still works as long
# as no computation has run yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: kernel tests trigger many small XLA compiles;
# cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The env vars above are a no-op when jax was already imported at
# interpreter startup (sitecustomize preloads it in this environment and
# the config defaults are captured at import time) — set the persistent
# compile cache through the config API, which works as long as no
# computation has run yet.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
