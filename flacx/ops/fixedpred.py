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


def fixed_order_zz_sums(x: jnp.ndarray, eff_bps: int,
                        use_tile_kernel: bool | None = None) -> jnp.ndarray:
    """Exact zigzag magnitude sums of all five fixed-order residuals.

    ``out[..., o] = Σ_i zigzag(Δᵒx)[i] · (i >= o)`` — the candidate-size
    statistic the encoder ranks fixed predictors by (reference ranking:
    flac/encoder.py:374-390).

    ``use_tile_kernel`` routes through the single-HBM-pass Pallas kernel
    (``flacx.kernels.zzsum_tile``) instead of one emulated-int64 reduce
    fusion per order; None = auto (TPU, int32 input, ``eff_bps <= 17``
    for exact int32 tile partials, rows a multiple of 128).  Both paths
    are bit-identical.

    Args:
      x: integer samples ``[..., n]``.
      eff_bps: effective bits per sample incl. stereo-side widening.
    Returns:
      ``[..., 5]`` int64.
    """
    import jax

    from flacx.ops.rice import zigzag

    n = x.shape[-1]
    lead = x.shape[:-1]
    r = 1
    for d in lead:
        r *= d
    if use_tile_kernel is None:
        use_tile_kernel = (jax.default_backend() == "tpu"
                           and x.dtype == jnp.int32 and eff_bps <= 17
                           and r % 128 == 0 and n >= 5)
    if use_tile_kernel:
        from flacx.kernels.zzsum_tile import fixed_order_sums
        xin = x if (x.ndim == 3 and 128 % x.shape[1] == 0) \
            else x.reshape(r, n)
        return fixed_order_sums(xin).reshape(*lead, 5)

    i_pos = jnp.arange(n, dtype=jnp.int32)
    cols = []
    cur = x
    for o in range(5):
        if o:
            cur = cur - shift_right_one(cur)
        cols.append(jnp.sum(zigzag(cur) * (i_pos >= o), axis=-1,
                            dtype=jnp.int64))
    return jnp.stack(cols, axis=-1)
