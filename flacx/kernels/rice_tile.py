"""Pallas kernel: exact Rice parameter search statistics in one zz pass.

``flacx.ops.rice.exact_plan`` needs, per candidate partition order, the
per-partition exact argmin over the Rice parameter k of
``S_k + (k+1)·count`` with ``S_k = Σ (zz >> k)`` — the reference's
exhaustive sweep (flac/encoder.py:655-753) done exactly.  As XLA
fusions this re-streams the ``[B, C, N]`` zigzag array once per k
(~0.95 GB of the headline batch's reported HBM bytes, the single
largest traffic item of BENCH_r04) and, at many-partition hi-res
configs, materializes ``[B, C, K, nparts]`` sum stacks level by level.

This kernel reads each zigzag tile ONCE and computes, per partition of
every in-tile level (partition size ≤ the tile), the finished running
minima the search needs — ``min4/arg4`` (k ≤ 14, the 4-bit method),
``min5/arg5`` (k ≤ kmax) and the partition max (for the escape size and
the code-length cap) — emitting only the tiny per-partition results.
Levels coarser than a tile get per-tile ``S_k`` rows + tile maxima that
``exact_plan`` folds up pairwise (≤ ``n / tile`` values per frame).

Layout notes (TPU): samples ride sublanes, frames ride lanes.  Segment
reductions use sublane-aligned reshapes when the partition size is a
multiple of 8; sizes 2 and 4 use log-shift partial sums (unaligned
concat rolls) whose valid rows are extracted by masked aligned-reshape
reductions into an OFFSET-MAJOR compact order that the host-side
wrapper un-permutes (tiny arrays).  Strided sublane slicing and
one-hot-matmul extraction are avoided: the former lowers to an
unsupported gather, the latter miscompiles when fed roll-derived
values (verified on TPU v5e, round 5).

Exactness: identical int32 wrap-around semantics to the XLA search —
sums only matter where the code-length cap holds, in which case every
``zz >> k ≤ 31`` and all sums are tiny; the ineligible (possibly
wrapped) sums are masked by the cap predicate computed from the exact
partition max.  Sentinel ``SENT`` matches ``exact_plan``'s int32
invalid marker.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 512
SENT = 1 << 28          # must equal exact_plan's int32 invalid sentinel
CODE_BITS_MAX = 32


class RiceKernelStats(NamedTuple):
    """Per-level finished search results + cross-tile raw sums.

    ``levels[po] = (min4, arg4, min5, arg5, m)`` each ``[B, C, 1 << po]``
    int32 (min* carry ``SENT`` where no k is eligible); ``tile_sums``
    (chunked inputs only) is ``(s_k [B, C, K, n_tiles] int32,
    m_tile [B, C, n_tiles] int32)`` at tile granularity.
    """
    levels: dict
    tile_sums: tuple | None
    tile: int


def _ceil8(v: int) -> int:
    return -(-v // 8) * 8


def supported_levels(n: int, porders, tile: int) -> tuple | None:
    """Split levels into (in_kernel, cross_tile, closed) or None if some
    level fits no strategy (caller then keeps the XLA search)."""
    whole = n <= 8192 and n % 128 == 0
    if not whole and n % tile != 0:
        return None
    t = n if whole else tile
    in_kernel, cross, closed = [], [], []
    for po in porders:
        p = n >> po
        if p * (1 << po) != n:
            return None
        if p == 1:
            closed.append(po)       # exact_plan's closed form covers it
        elif p <= t and t % p == 0 and (p % 8 == 0 or p in (2, 4)):
            in_kernel.append(po)
        elif p > t and p % t == 0:
            cross.append(po)
        else:
            return None
    if closed and (max(porders) not in closed):
        return None                 # closed form only exists at max_po
    return tuple(in_kernel), tuple(cross), tuple(closed), t


def _segsum(a: jnp.ndarray, p: int, t: int):
    """Exact per-segment sums of ``a [t, LANES]`` at segment size ``p``.

    Returns ``[ceil8(t // p), LANES]`` rows: natural order for
    ``p % 8 == 0``, OFFSET-MAJOR for p in (2, 4) (see module doc).
    """
    nseg = t // p
    if p % 8 == 0:
        out = jnp.sum(a.reshape(nseg, p, LANES), axis=1,
                      dtype=jnp.int32)
        if nseg % 8:
            out = jnp.concatenate(
                [out, jnp.zeros((_ceil8(nseg) - nseg, LANES), a.dtype)],
                axis=0)
        return out
    # p in (2, 4): log-shift partial sums, valid at rows ≡ 0 (mod p)
    s = a + jnp.concatenate([a[1:], a[:1]], axis=0)
    if p == 4:
        s = s + jnp.concatenate([s[2:], s[:2]], axis=0)
    g = t // 8
    r3 = s.reshape(g, 8, LANES)
    off_sel = jax.lax.broadcasted_iota(jnp.int32, (g, 8, LANES), 1)
    outs = [jnp.sum(jnp.where(off_sel == off, r3, jnp.int32(0)), axis=1,
                    dtype=jnp.int32)
            for off in range(0, 8, p)]
    return jnp.concatenate(outs, axis=0)    # [(8//p) * g, LANES]


def _segmax(a: jnp.ndarray, p: int, t: int):
    """Per-segment max, same layout contract as :func:`_segsum`
    (``a`` must be non-negative)."""
    nseg = t // p
    if p % 8 == 0:
        out = jnp.max(a.reshape(nseg, p, LANES), axis=1)
        if nseg % 8:
            out = jnp.concatenate(
                [out, jnp.zeros((_ceil8(nseg) - nseg, LANES), a.dtype)],
                axis=0)
        return out
    m = jnp.maximum(a, jnp.concatenate([a[1:], a[:1]], axis=0))
    if p == 4:
        m = jnp.maximum(m, jnp.concatenate([m[2:], m[:2]], axis=0))
    g = t // 8
    r3 = m.reshape(g, 8, LANES)
    off_sel = jax.lax.broadcasted_iota(jnp.int32, (g, 8, LANES), 1)
    outs = [jnp.max(jnp.where(off_sel == off, r3, jnp.int32(0)), axis=1)
            for off in range(0, 8, p)]
    return jnp.concatenate(outs, axis=0)


def _rice_stats_body(zzt, order_row, first_tile, t: int,
                     psizes: tuple, kmax: int, n_k4: int,
                     tile_rows: bool):
    """Shared kernel body: ``zzt [t, LANES]`` i32 (non-negative zigzag),
    ``order_row [1, LANES]``, ``first_tile`` scalar bool predicate.

    Returns the list of row-blocks: per level (ascending psize order —
    i.e. FINEST first) ``[min4 | arg4 | min5 | arg5 | m]`` each
    ``ceil8(nseg)`` rows, then (``tile_rows``) kmax+1 tile-sum rows and
    one tile-max row, padded to 8.
    """
    # per-level compact maxima + derived eligibility data (k-invariant)
    lv = []
    for p in psizes:
        nseg = t // p
        m = _segmax(zzt, p, t)
        rows8 = m.shape[0]
        seg0 = (jax.lax.broadcasted_iota(jnp.int32, (rows8, LANES), 0)
                == 0) & first_tile
        cnt = jnp.where(seg0, jnp.int32(p) - order_row, jnp.int32(p))
        sent = jnp.full((rows8, LANES), SENT, jnp.int32)
        zero = jnp.zeros((rows8, LANES), jnp.int32)
        lv.append({"p": p, "nseg": nseg, "m": m, "cnt": cnt,
                   "min4": sent, "arg4": zero, "min5": sent, "arg5": zero})

    tile_sum_rows = []
    tile_max = None
    if tile_rows:
        tile_max = jnp.max(zzt, axis=0, keepdims=True)

    for k in range(kmax + 1):
        zzk = zzt >> k if k else zzt
        if tile_rows:
            tile_sum_rows.append(jnp.sum(zzk, axis=0, keepdims=True,
                                         dtype=jnp.int32))
        for d in lv:
            s = _segsum(zzk, d["p"], t)
            bits = s + (k + 1) * d["cnt"]
            ok = (d["m"] >> k) + (k + 1) <= CODE_BITS_MAX
            bits = jnp.where(ok, bits, jnp.int32(SENT))
            upd5 = bits < d["min5"]
            d["min5"] = jnp.where(upd5, bits, d["min5"])
            d["arg5"] = jnp.where(upd5, jnp.int32(k), d["arg5"])
            if k < n_k4:
                upd4 = bits < d["min4"]
                d["min4"] = jnp.where(upd4, bits, d["min4"])
                d["arg4"] = jnp.where(upd4, jnp.int32(k), d["arg4"])

    rows = []
    for d in lv:
        rows += [d["min4"], d["arg4"], d["min5"], d["arg5"], d["m"]]
    if tile_rows:
        rows += tile_sum_rows
        rows.append(tile_max)
        pad = (-(kmax + 2)) % 8
        if pad:
            rows.append(jnp.zeros((pad, LANES), jnp.int32))
    return rows


def _whole_kernel(n: int, psizes: tuple, kmax: int, n_k4: int,
                  zz_ref, meta_ref, out_ref):
    zzt = zz_ref[...].T
    rows = _rice_stats_body(zzt, meta_ref[0, 0, 0:1, :], True, n,
                            psizes, kmax, n_k4, False)
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)


def _chunk_kernel(n: int, psizes: tuple, kmax: int, n_k4: int,
                  zz_ref, meta_ref, out_ref):
    j = pl.program_id(2)
    zzt = zz_ref[...].T
    rows = _rice_stats_body(zzt, meta_ref[0, 0, 0:1, :], j == 0, TILE,
                            psizes, kmax, n_k4, True)
    out_ref[0, 0, 0] = jnp.concatenate(rows, axis=0)


def _level_rows(psizes: tuple, t: int) -> tuple[dict, int]:
    """Static row offsets of each level's 5 arrays in the kernel output."""
    offs = {}
    row = 0
    for p in psizes:
        rows8 = _ceil8(t // p)
        offs[p] = row
        row += 5 * rows8
    return offs, row


def rice_stats_tiles(zz: jnp.ndarray, order: jnp.ndarray,
                     porders: tuple, kmax: int,
                     interpret: bool = False) -> RiceKernelStats:
    """Exact per-level Rice search statistics, one pass over ``zz``.

    Args:
      zz: ``[B, C, N]`` int32 zigzag magnitudes, zeros at warmup
        positions (``B`` a multiple of 128).
      order: ``[B, C]`` int32 predictor order (shortens partition 0).
      porders: static candidate partition orders (each must pass
        :func:`supported_levels` — the caller gates on it).
      kmax: largest Rice parameter searched.
    Returns:
      :class:`RiceKernelStats` — bit-identical min/argmin/max values to
      ``exact_plan``'s own int32 search arithmetic.
    """
    b, c, n = zz.shape
    assert b % LANES == 0
    sup = supported_levels(n, porders, TILE)
    assert sup is not None, "caller must gate on supported_levels"
    in_kernel, cross, _closed, t = sup
    psizes = tuple(sorted(n >> po for po in in_kernel))
    n_k4 = min(kmax, 14) + 1
    grid_b = b // LANES

    meta = order.astype(jnp.int32)[..., None]
    meta_t = jnp.pad(meta, ((0, 0), (0, 0), (0, 7))) \
        .reshape(grid_b, LANES, c, 8).transpose(0, 2, 3, 1)

    offs, r_levels = _level_rows(psizes, t)

    if n <= 8192 and n % 128 == 0:
        out = pl.pallas_call(
            functools.partial(_whole_kernel, n, psizes, kmax, n_k4),
            grid=(grid_b, c),
            in_specs=[
                pl.BlockSpec((LANES, n), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda i, j: (i, j, j - j, j - j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, r_levels, LANES),
                                   lambda i, j: (i, j, j - j, j - j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_b, c, r_levels, LANES),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(zz.reshape(b, c * n), meta_t)
        # [grid_b, c, R, LANES] -> [B, c, R]
        flat = out.transpose(0, 3, 1, 2).reshape(b, c, r_levels)
        nt = 1
        tile_sums = None
    else:
        assert n % TILE == 0
        nt = n // TILE
        r_total = r_levels + _ceil8(kmax + 2)
        out = pl.pallas_call(
            functools.partial(_chunk_kernel, n, psizes, kmax, n_k4),
            grid=(grid_b, c, nt),
            in_specs=[
                pl.BlockSpec((LANES, TILE),
                             lambda i, ch, j: (i, ch * nt + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda i, ch, j: (i, ch, j - j, j - j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, r_total, LANES),
                                   lambda i, ch, j: (i, ch, j, j - j,
                                                     j - j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_b, c, nt, r_total,
                                            LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(zz.reshape(b, c * n), meta_t)
        # [grid_b, c, nt, R, LANES] -> [B, c, nt, R]
        flat = out.transpose(0, 4, 1, 2, 3).reshape(b, c, nt, r_total)
        sk = flat[..., r_levels: r_levels + kmax + 1]    # [B,C,nt,K]
        m_tile = flat[..., r_levels + kmax + 1]          # [B,C,nt]
        tile_sums = (sk.swapaxes(-1, -2), m_tile)        # [B,C,K,nt]

    def level_array(p: int, a_idx: int) -> jnp.ndarray:
        nseg_t = t // p
        rows8 = _ceil8(nseg_t)
        base = offs[p] + a_idx * rows8
        if nt == 1:
            v = flat[..., base: base + rows8]
        else:
            v = flat[..., base: base + rows8]            # [B,C,nt,rows8]
        if p % 8 == 0:
            v = v[..., :nseg_t]
        else:
            # offset-major -> natural: row off*(t//8) + g  ==  seg g*(8//p)+off
            n_off, g = 8 // p, t // 8
            v = v.reshape(*v.shape[:-1], n_off, g) \
                .swapaxes(-1, -2).reshape(*v.shape[:-1], nseg_t)
        if nt > 1:
            v = v.reshape(b, c, nt * nseg_t)
        return v

    levels = {}
    for po in in_kernel:
        p = n >> po
        levels[po] = tuple(level_array(p, i) for i in range(5))
    return RiceKernelStats(levels=levels, tile_sums=tile_sums, tile=t)
