"""Pallas kernel: per-sample symbol emission straight into packer tiles.

The XLA emit stage materializes several ``[B, C, N]`` intermediates
(per-sample Rice parameters, escape flags, residual masks, symbol
values/lengths) in the frame-minor transposed layout the packer's tile
reshape forces — ~1.2 ms/batch of strided predicate/select fusions at
1024×2×4608.  This kernel computes each frame row's sample and
partition-parameter symbols for ONE channel from the zigzag residuals
in VMEM and writes the packer's ``[slot, lane]`` tile layout directly:
one read of the residual/sample rows, dense writes, no intermediate
``[B, C, N]`` arrays.  Lanes are frames, so each channel's tile strings
line up with the per-frame upper merge.

Slot layout (must match ``flacx.ops.emit.subframe_symbols``'s blocked
fast path, which remains the XLA fallback and the cross-check oracle):

  [33 param slots + 7 pad] [psize_min samples]
  then per later segment: [1 param slot + 7 pad] [psize_min samples]

Legality of the blocked layout (all 33 head params before the first
sample block) is argued in ``emit.subframe_symbols``; zero-length slots
are position-free.

The returned arrays are ``[B // LANES, slots_padded, LANES]`` — a pure
reshape away from the pre-transposed ``[grid, TILE, LANES]`` tile-merge
input, so the emit→pack boundary carries no HBM transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flacx.ops.emit import KIND_FIXED, KIND_VERBATIM

LANES = 128
TILE = 512          # packer tile size the output is padded to


def _sample_syms(m: int, psize: int, base, zz, x, kesc_seg, meta_ref):
    """Per-sample symbol values/lengths for ``m`` samples (shared by the
    blocked and segmented kernels).

    ``zz``/``x`` are ``[m, LANES]`` i32, ``kesc_seg`` is
    ``[m // psize, LANES]`` per-segment ``k | esc << 7``, ``base`` the
    chunk's global sample offset (an i32 scalar or Python int).
    """
    nseg = m // psize
    kesc = jnp.broadcast_to(kesc_seg[:, None, :],
                            (nseg, psize, kesc_seg.shape[-1])
                            ).reshape(m, -1)    # [m, LANES]

    kind = meta_ref[0, 0:1, :]                  # [1, LANES] i32
    order = meta_ref[0, 1:2, :]
    bps = meta_ref[0, 2:3, :]

    i_pos = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 0) + base
    is_pred = kind >= KIND_FIXED
    in_resid = is_pred & (i_pos >= order)
    k = kesc & 31
    escf = (kesc >> 7) != 0

    zzu = zz.astype(jnp.uint32)
    ku = k.astype(jnp.uint32)
    one = jnp.uint32(1)
    rice_v = (one << ku) | (zzu & ((one << ku) - one))
    rice_l = (zz >> k) + 1 + k
    r_signed = (zz >> 1) ^ -(zz & 1)
    esc_v = r_signed.astype(jnp.uint32) & ((one << ku) - one)
    pred_v = jnp.where(escf, esc_v, rice_v)
    pred_l = jnp.where(escf, k, rice_l)

    bps_mask = (one << bps.astype(jnp.uint32)) - one
    verb_v = x.astype(jnp.uint32) & bps_mask
    is_verb = kind == KIND_VERBATIM
    samp_v = jnp.where(is_verb, verb_v, pred_v)
    samp_l = jnp.where(is_verb, bps,
                       jnp.where(in_resid, pred_l, jnp.int32(0)))
    return samp_v, samp_l


def _emit_kernel(n: int, psize_min: int, slots_pad: int,
                 zz_ref, x_ref, kesc_ref, pv_ref, plen_ref, meta_ref,
                 out_v_ref, out_l_ref):
    zz = zz_ref[...].T                          # [N, LANES] i32 (masked)
    x = x_ref[...].T                            # [N, LANES] i32
    # per-SEGMENT Rice parameter/escape (k | esc << 7), expanded to
    # per-sample entirely in VMEM — partitions are unions of the finest
    # psize_min grid, so no [B, C, N] parameter expansion ever touches
    # HBM (it cost ~0.5 ms/batch of i8/pred passes + layout copies)
    nseg = n // psize_min
    samp_v, samp_l = _sample_syms(n, psize_min, 0, zz, x,
                                  kesc_ref[0, :nseg, :], meta_ref)

    pv = pv_ref[0]                              # [params_pad, LANES] u32
    plen = plen_ref[0]                          # [params_pad, LANES] i32

    nseg = n // psize_min
    zv7 = jnp.zeros((7, LANES), jnp.uint32)
    zl7 = jnp.zeros((7, LANES), jnp.int32)
    vparts = [pv[:33], zv7, samp_v[:psize_min]]
    lparts = [plen[:33], zl7, samp_l[:psize_min]]
    for g in range(1, nseg):
        vparts += [pv[32 + g: 33 + g], zv7,
                   samp_v[g * psize_min: (g + 1) * psize_min]]
        lparts += [plen[32 + g: 33 + g], zl7,
                   samp_l[g * psize_min: (g + 1) * psize_min]]
    used = 40 + psize_min + (nseg - 1) * (psize_min + 8)
    if slots_pad > used:
        vparts.append(jnp.zeros((slots_pad - used, LANES), jnp.uint32))
        lparts.append(jnp.zeros((slots_pad - used, LANES), jnp.int32))
    out_v_ref[0] = jnp.concatenate(vparts, axis=0)
    out_l_ref[0] = jnp.concatenate(lparts, axis=0)


def _emit_seg_kernel(psize: int, chunk_segs: int,
                     zz_ref, x_ref, kesc_ref, pv_ref, plen_ref, meta_ref,
                     out_v_ref, out_l_ref):
    """Segmented layout: ``chunk_segs`` segments of ``[1 param slot,
    psize samples]`` per grid step (dense — no 8-pad; the slot span per
    chunk is a whole number of packer tiles by construction).  Off-grid
    head params ride in the header string (``tilepack``)."""
    j = pl.program_id(1)
    s = chunk_segs
    m = s * psize                               # samples per chunk
    zz = zz_ref[...].T                          # [m, LANES] i32
    x = x_ref[...].T
    samp_v, samp_l = _sample_syms(m, psize, j * m, zz, x,
                                  kesc_ref[0], meta_ref)

    sv3 = samp_v.reshape(s, psize, LANES)
    sl3 = samp_l.reshape(s, psize, LANES)
    pv3 = pv_ref[0][:, None, :]                 # [s, 1, LANES] u32
    pl3 = plen_ref[0][:, None, :]
    out_v_ref[0] = jnp.concatenate([pv3, sv3], axis=1) \
        .reshape(s * (psize + 1), LANES)
    out_l_ref[0] = jnp.concatenate([pl3, sl3], axis=1) \
        .reshape(s * (psize + 1), LANES)


@functools.partial(jax.jit,
                   static_argnames=("channel", "psize_min", "interpret"))
def emit_sample_tiles(zz: jnp.ndarray, x: jnp.ndarray, kesc: jnp.ndarray,
                      param_v: jnp.ndarray, param_l: jnp.ndarray,
                      kind: jnp.ndarray, order: jnp.ndarray,
                      bps: jnp.ndarray, channel: int, psize_min: int,
                      interpret: bool = False
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample+param symbol tiles for one channel of ``[B, C, ...]`` rows.

    Args:
      zz: ``[B, C, N]`` int32 zigzag residuals, zero outside
        ``i >= order``.
      x: ``[B, C, N]`` int32 samples (verbatim source).
      kesc: ``[B, C, nseg]`` int32 — per finest-grid SEGMENT
        (``nseg = N // psize_min``): Rice parameter (5 bits) |
        escape << 7; expanded per-sample inside the kernel.
      param_v / param_l: ``[B, C, P]`` u32 / i32 partition-parameter
        symbols (``P = 33 + N // psize_min - 1``; zero-length where
        absent).
      kind / order / bps: ``[B, C]`` int32 subframe metadata.
      channel: static channel index this call emits.
      psize_min: finest legal partition size (static; ≥ 40, multiple of
        8, divides ``N``).
    Returns:
      ``(values u32, lengths i32)`` of shape ``[B // 128, S_pad, 128]``
      (lanes = frames) where ``S_pad`` is the blocked slot count padded
      to whole 512-slot packer tiles — bit-identical slot content to
      the XLA blocked emit path, already in tile-transposed layout.
    """
    b, c, n = zz.shape
    assert b % LANES == 0 and n % psize_min == 0 and n > psize_min
    nseg = n // psize_min
    used = 40 + psize_min + (nseg - 1) * (psize_min + 8)
    slots_pad = -(-used // TILE) * TILE
    grid_b = b // LANES
    ch = channel

    p = param_v.shape[-1]
    p8 = -(-p // 8) * 8
    pv_t = jnp.pad(param_v[:, ch], ((0, 0), (0, p8 - p))) \
        .reshape(grid_b, LANES, p8).transpose(0, 2, 1)
    pl_t = jnp.pad(param_l[:, ch], ((0, 0), (0, p8 - p))) \
        .reshape(grid_b, LANES, p8).transpose(0, 2, 1)
    # channel slicing of the big arrays happens in the BlockSpec (a
    # block-column of the [B, C·N] view — a free row-major reshape)
    zz2 = zz.reshape(b, c * n)
    x2 = x.reshape(b, c * n)
    nseg8 = -(-nseg // 8) * 8
    kesc_t = jnp.pad(kesc[:, ch].astype(jnp.int32),
                     ((0, 0), (0, nseg8 - nseg))) \
        .reshape(grid_b, LANES, nseg8).transpose(0, 2, 1)
    meta = jnp.stack([kind[:, ch].astype(jnp.int32),
                      order[:, ch].astype(jnp.int32),
                      bps[:, ch].astype(jnp.int32)], axis=-1)
    meta_t = jnp.pad(meta, ((0, 0), (0, 5))) \
        .reshape(grid_b, LANES, 8).transpose(0, 2, 1)

    out_v, out_l = pl.pallas_call(
        functools.partial(_emit_kernel, n, psize_min, slots_pad),
        grid=(grid_b,),
        in_specs=[
            # i - i + ch, not the literal: a bare int becomes an i64
            # constant under x64 and fails Mosaic index-map legalization
            pl.BlockSpec((LANES, n), lambda i: (i, i - i + ch),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, n), lambda i: (i, i - i + ch),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nseg8, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p8, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p8, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, slots_pad, LANES),
                         lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slots_pad, LANES),
                         lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid_b, slots_pad, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((grid_b, slots_pad, LANES), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zz2, x2, kesc_t, pv_t, pl_t, meta_t)
    return out_v, out_l


@functools.partial(jax.jit,
                   static_argnames=("channel", "psize_min", "chunk_segs",
                                    "interpret"))
def emit_sample_tiles_seg(zz: jnp.ndarray, x: jnp.ndarray,
                          kesc: jnp.ndarray, pv_seg: jnp.ndarray,
                          pl_seg: jnp.ndarray, kind: jnp.ndarray,
                          order: jnp.ndarray, bps: jnp.ndarray,
                          channel: int, psize_min: int, chunk_segs: int,
                          interpret: bool = False
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Segmented-layout variant of :func:`emit_sample_tiles` for fine
    partitions (``psize_min < 40``, e.g. block 16384 at ``-r 14``).

    Args differ from the blocked variant in the params: ``pv_seg`` /
    ``pl_seg`` are ``[B, C, nseg]`` — the partition-parameter symbols
    ALREADY GATHERED to the on-grid positions (``segmented_layout``'s
    ``mult_idx``); off-grid head params are the caller's job (they go
    in the header string).  ``chunk_segs`` is ``segmented_layout``'s
    chunk (segments per grid step).

    Returns ``(values u32, lengths i32)`` of shape
    ``[B // 128, nseg * (psize_min + 1), 128]`` — whole packer tiles,
    same symbol stream as ``subframe_symbols``' general branch.
    """
    b, c, n = zz.shape
    nseg = n // psize_min
    assert b % LANES == 0 and nseg % chunk_segs == 0
    chunk_slots = chunk_segs * (psize_min + 1)
    m = chunk_segs * psize_min                  # samples per chunk
    assert chunk_slots % TILE == 0 and chunk_segs % 8 == 0
    assert m % 128 == 0, "segmented_layout must gate chunk width"
    slots = nseg * (psize_min + 1)
    n_chunks = nseg // chunk_segs
    grid_b = b // LANES
    ch = channel

    def seg_t(a):
        return a.reshape(grid_b, LANES, nseg).transpose(0, 2, 1)

    pv_t = seg_t(pv_seg[:, ch])
    pl_t = seg_t(pl_seg[:, ch])
    kesc_t = seg_t(kesc[:, ch].astype(jnp.int32))
    meta = jnp.stack([kind[:, ch].astype(jnp.int32),
                      order[:, ch].astype(jnp.int32),
                      bps[:, ch].astype(jnp.int32)], axis=-1)
    meta_t = jnp.pad(meta, ((0, 0), (0, 5))) \
        .reshape(grid_b, LANES, 8).transpose(0, 2, 1)

    # channel slicing + chunking ride the BlockSpec over the [B, C·N]
    # view (free row-major reshape): chunk j of channel ch is block
    # column ch·n_chunks + j
    zz2 = zz.reshape(b, c * n)
    x2 = x.reshape(b, c * n)

    seg_block = pl.BlockSpec((1, chunk_segs, LANES),
                             lambda i, j: (i, j, j - j),
                             memory_space=pltpu.VMEM)
    out_v, out_l = pl.pallas_call(
        functools.partial(_emit_seg_kernel, psize_min, chunk_segs),
        grid=(grid_b, n_chunks),
        in_specs=[
            pl.BlockSpec((LANES, m),
                         lambda i, j: (i, j + ch * n_chunks),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, m),
                         lambda i, j: (i, j + ch * n_chunks),
                         memory_space=pltpu.VMEM),
            seg_block,
            seg_block,
            seg_block,
            pl.BlockSpec((1, 8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, chunk_slots, LANES),
                         lambda i, j: (i, j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_slots, LANES),
                         lambda i, j: (i, j, j - j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid_b, slots, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((grid_b, slots, LANES), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zz2, x2, kesc_t, pv_t, pl_t, meta_t)
    return out_v, out_l
