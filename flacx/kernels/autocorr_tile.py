"""Pallas kernel: all-lag autocorrelation in one pass over the signal.

The XLA formulation (``flacx.ops.lpc.autocorrelate``) issues one
product+reduce fusion per lag, each re-streaming the whole windowed
signal from HBM with emulated-f64 accumulation — at batch 1024 / order
12 that is 13 × 75 MB ≈ 1 GB of traffic and ~4 ms of the 16.6 ms encode
module (profiled round 2).  Here the signal is read ONCE: blocks arrive
in their natural row-major layout (rows on sublanes, samples on lanes)
and are transposed **in VMEM** to the compute layout (samples on
sublanes — lag shifts are then cheap static sublane slices, the same
trick as ``bitpack_tile``); the apodization window is multiplied inside
the kernel, so neither the windowed signal nor its transpose is ever
materialized in HBM.  Each tile computes every lag's partial
product-sum against a small sublane lookahead, and the tiny per-tile
partials ``[tiles, lags, rows]`` are combined in f64 by XLA afterwards —
preserving the "products in f32, accumulation in f64 (pairwise)"
numerics contract of the XLA path to within ordinary reduction-order
rounding.

Replaces the hot loop of the reference's per-lag ``autocorrelation``
(flac/encoder.py:443-450) on the device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # samples per tile (compute sublane axis)
LANES = 128         # rows (subframes) per block (compute lane axis)
MAX_LAGS = 64       # sublane lookahead budget (FLAC needs ≤ 33)


def _autocorr_kernel(n_lags: int, lag_sub: int, n_tiles: int, bv: int | None,
                     x_ref, nxt_ref, w_ref, wn_ref, out_ref):
    j = pl.program_id(1)
    xb, nb = x_ref[...], nxt_ref[...]
    if bv is not None:
        xb = xb.reshape(LANES, TILE)
        nb = nb.reshape(LANES, TILE)
    # int32 signals convert to f32 IN VMEM (the [R, N] f32 copy the XLA
    # path materializes in HBM never exists), then window-multiply in the
    # natural [LANES, TILE] layout and transpose to the compute layout
    if xb.dtype != jnp.float32:
        xb = xb.astype(jnp.float32)
        nb = nb.astype(jnp.float32)
    cur = (xb * w_ref[...]).T                    # [TILE, LANES] f32
    look = (nb * wn_ref[...]).T[:MAX_LAGS]
    # the final tile has no lookahead (its block index is clamped)
    look = look * (j != n_tiles - 1).astype(jnp.float32)
    ext = jnp.concatenate([cur, look], axis=0)

    parts = []
    for lag in range(n_lags):
        parts.append(jnp.sum(cur * ext[lag: lag + TILE], axis=0))
    acc = jnp.stack(parts, axis=0)               # [n_lags, LANES]
    out_ref[0, :, :] = jnp.pad(acc, ((0, lag_sub - n_lags), (0, 0)))


@functools.partial(jax.jit, static_argnames=("max_lag", "interpret"))
def autocorr_tiled(v: jnp.ndarray, max_lag: int,
                   window: jnp.ndarray | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Autocorrelation lags ``0..max_lag`` of zero-padded rows.

    Args:
      v: ``[R, N]`` f32 or int32 rows (``R`` a multiple of 128), or
        ``[B, V, N]`` with ``V`` dividing 128 (read through a 3D block
        spec — no reshape/retiling copy).  int32 converts to f32 inside
        the kernel.  Plain zero-padded autocorrelation
        ``Σ_i v[i]·v[i+lag]`` — callers wanting the reference's
        drop-last-product range zero the final sample (or final window
        element) first.
      max_lag: largest lag (``< MAX_LAGS``).
      window: optional ``[N]`` f32 apodization window, multiplied
        element-wise inside the kernel (the windowed signal is never
        materialized).
    Returns:
      ``[R, max_lag+1]`` f64.
    """
    n = v.shape[-1]
    r = 1
    for d in v.shape[:-1]:
        r *= d
    n_lags = max_lag + 1
    assert n_lags <= MAX_LAGS and r % LANES == 0
    lag_sub = -(-n_lags // 8) * 8              # sublane-aligned lag rows

    n_tiles = -(-n // TILE)
    nt = n_tiles
    bv = None
    if v.ndim == 3 and LANES % v.shape[1] == 0:
        bv = v.shape[1]
    elif v.ndim == 3:
        v = v.reshape(r, n)
    if window is None:
        window = jnp.ones((n,), jnp.float32)
    window = window.astype(jnp.float32)
    if n_tiles * TILE != n:
        pad_n = n_tiles * TILE - n
        v = jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, pad_n),))
        window = jnp.pad(window, (0, pad_n))
    w2 = window[None, :]                       # [1, N]

    if bv is not None:
        x_spec = pl.BlockSpec((LANES // bv, bv, TILE),
                              lambda i, j: (i, j - j, j),
                              memory_space=pltpu.VMEM)
        nxt_spec = pl.BlockSpec(
            (LANES // bv, bv, TILE),
            lambda i, j: (i, j - j, jnp.minimum(j + 1, nt - 1)),
            memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((LANES, TILE), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
        nxt_spec = pl.BlockSpec((LANES, TILE),
                                lambda i, j: (i, jnp.minimum(j + 1, nt - 1)),
                                memory_space=pltpu.VMEM)
    grid = (r // LANES, nt)
    out = pl.pallas_call(
        functools.partial(_autocorr_kernel, n_lags, lag_sub, nt, bv),
        grid=grid,
        in_specs=[
            x_spec,
            nxt_spec,
            pl.BlockSpec((1, TILE), lambda i, j: (i - i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE),
                         lambda i, j: (i - i, jnp.minimum(j + 1, nt - 1)),
                         memory_space=pltpu.VMEM),
        ],
        # lane index is i-i, not 0: an i64 literal (under x64) fails
        # Mosaic legalization in the index map
        out_specs=pl.BlockSpec((1, lag_sub, LANES),
                               lambda i, j: (j, i - i, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, lag_sub, r), jnp.float32),
        interpret=interpret,
    )(v, v, w2, w2)

    # cross-tile combine in f64 — the accumulation dtype contract
    return jnp.sum(out[:, :n_lags, :], axis=0, dtype=jnp.float64).T
