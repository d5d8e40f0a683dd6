"""Pallas kernel: all-lag autocorrelation in one pass over the signal.

The XLA formulation (``flacx.ops.lpc.autocorrelate``) issues one
product+reduce fusion per lag, each re-streaming the whole windowed
signal from HBM with emulated-f64 accumulation — at batch 1024 / order
12 that is 13 × 75 MB ≈ 1 GB of traffic and ~4 ms of the 16.6 ms encode
module (profiled round 2).  Here the signal is read ONCE: rows sit on
lanes and samples on sublanes (lag shifts are then cheap static sublane
slices — the same layout trick as ``bitpack_tile``), each VMEM tile
computes every lag's partial product-sum against a small sublane
lookahead, and the tiny per-tile partials ``[tiles, lags, rows]`` are
combined in f64 by XLA afterwards — preserving the "products in f32,
accumulation in f64 (pairwise)" numerics contract of the XLA path to
within ordinary reduction-order rounding.

Replaces the hot loop of the reference's per-lag ``autocorrelation``
(flac/encoder.py:443-450) on the device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # samples per tile (sublane axis)
LANES = 128         # rows (subframes) per block (lane axis)
MAX_LAGS = 64       # sublane lookahead budget (FLAC needs ≤ 33)


def _autocorr_kernel(n_lags: int, lag_sub: int, cur_ref, nxt_ref, out_ref):
    cur = cur_ref[...]                         # [TILE, LANES] f32
    ext = jnp.concatenate([cur, nxt_ref[...][:MAX_LAGS]], axis=0)

    parts = []
    for lag in range(n_lags):
        parts.append(jnp.sum(cur * ext[lag: lag + TILE], axis=0))
    acc = jnp.stack(parts, axis=0)             # [n_lags, LANES]
    out_ref[0, :, :] = jnp.pad(acc, ((0, lag_sub - n_lags), (0, 0)))


@functools.partial(jax.jit, static_argnames=("max_lag", "interpret"))
def autocorr_tiled(v: jnp.ndarray, max_lag: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Autocorrelation lags ``0..max_lag`` of zero-padded rows.

    Args:
      v: ``[R, N]`` f32 rows (``R`` a multiple of 128).  Plain
        zero-padded autocorrelation ``Σ_i v[i]·v[i+lag]`` — callers
        wanting the reference's drop-last-product range zero the final
        sample first.
      max_lag: largest lag (``< MAX_LAGS``).
    Returns:
      ``[R, max_lag+1]`` f64.
    """
    r, n = v.shape
    n_lags = max_lag + 1
    assert n_lags <= MAX_LAGS and r % LANES == 0
    lag_sub = -(-n_lags // 8) * 8              # sublane-aligned lag rows

    n_tiles = -(-n // TILE)
    # samples on sublanes, rows on lanes; one lookahead tile of zeros
    vt = jnp.pad(v, ((0, 0), (0, (n_tiles + 1) * TILE - n))).T

    grid = (r // LANES, n_tiles)
    out = pl.pallas_call(
        functools.partial(_autocorr_kernel, n_lags, lag_sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, LANES), lambda i, j: (j + 1, i),
                         memory_space=pltpu.VMEM),
        ],
        # lane index is i-i, not 0: an i64 literal (under x64) fails
        # Mosaic legalization in the index map
        out_specs=pl.BlockSpec((1, lag_sub, LANES),
                               lambda i, j: (j, i - i, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, lag_sub, r), jnp.float32),
        interpret=interpret,
    )(vt, vt)

    # cross-tile combine in f64 — the accumulation dtype contract
    return jnp.sum(out[:, :n_lags, :], axis=0, dtype=jnp.float64).T
