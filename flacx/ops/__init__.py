"""Device-side ops (JAX/XLA) for the batched codec pipelines.

Everything here operates on ``[..., block_size]`` sample batches under
``jax.jit``; leading dimensions are free (frames × virtual channels) and are
the axes sharded by ``flacx.parallel``.

Exact integer arithmetic requires 64-bit types (17-bit samples × 15-bit
coefficients × order-32 accumulation ≈ 37 bits, SURVEY.md §2.4), so x64 is
enabled at import.
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)

# The kernel-resident search/emit pipelines trace thousands of nested
# equations (per-k per-level unrolled loops inside pallas kernels inside
# the jitted encoder); JAX/Mosaic lowering recurses per nesting level and
# CPython's default 1000-frame limit aborts the trace on real configs.
if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)

from flacx.ops import bitpack, crcfold, fixedpred, headers, lpc, rice  # noqa: E402,F401
