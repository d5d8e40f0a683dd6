"""Fixed (polynomial) predictor residuals, batched.

The reference computes each order's residual with a fresh O(n·order) Python
loop (flac/encoder.py:331-359, 537-548).  Here all five orders come from one
fused chain of first differences: the order-k fixed residual *is* the k-th
difference of the signal, because the fixed predictor taps are the binomial
coefficients (flac/common.py:15-21).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift_right_one(x: jnp.ndarray) -> jnp.ndarray:
    """x[..., i] -> x[..., i-1], zero-filling position 0."""
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    return jnp.pad(x, pad)[..., :-1]


def fixed_residuals(x: jnp.ndarray, max_order: int = 4) -> jnp.ndarray:
    """All fixed-order residuals in one pass.

    Args:
      x: integer samples ``[..., n]``.
    Returns:
      ``[..., max_order+1, n]`` where row ``o`` holds the order-``o``
      residual at positions ``i >= o`` (positions ``i < o`` contain
      by-products and must be masked by the caller).
    """
    rows = [x]
    cur = x
    for _ in range(max_order):
        cur = cur - shift_right_one(cur)
        rows.append(cur)
    return jnp.stack(rows, axis=-2)


def order_mask(n: int, orders: jnp.ndarray) -> jnp.ndarray:
    """Validity mask ``[..., n]``: position ``i`` active iff ``i >= order``."""
    i = jnp.arange(n, dtype=jnp.int32)
    return i >= orders[..., None]
