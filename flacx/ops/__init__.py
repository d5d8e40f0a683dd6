"""Device-side ops (JAX/XLA) for the batched codec pipelines.

Everything here operates on ``[..., block_size]`` sample batches under
``jax.jit``; leading dimensions are free (frames × virtual channels) and are
the axes sharded by ``flacx.parallel``.

Exact integer arithmetic requires 64-bit types (17-bit samples × 15-bit
coefficients × order-32 accumulation ≈ 37 bits, SURVEY.md §2.4), so x64 is
enabled at import.
"""

import jax

jax.config.update("jax_enable_x64", True)

from flacx.ops import bitpack, crcfold, fixedpred, headers, lpc, rice  # noqa: E402,F401
