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
# Persistent compile cache: DISABLED for CPU test runs since round 5.
# This environment's VM migrates between physical hosts with different
# CPU feature sets; XLA:CPU AOT cache entries compiled under one feature
# set SIGILL/segfault when loaded under another (observed as segfaults
# inside compilation_cache reads and backend_compile during the suite,
# with "Machine type used for XLA:CPU compilation doesn't match"
# warnings).  The TPU-side cache (bench, tools) is unaffected — those
# executables target the TPU, not the host CPU.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
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
jax.config.update("jax_compilation_cache_dir", None)
