"""Pallas kernel: fused LPC residual MAC + selection statistics.

The estimate-mode encoder computes the chosen-order LPC residual
(``x[i] - (Σ_j taps_j·x[i-1-j] >> shift)``, reference
flac/encoder.py:537-548), masks its warmup, and reduces it twice — the
exact zigzag magnitude sum for cross-family candidate ranking and a
max-|residual| int32-eligibility check.  As XLA fusions that is the
single hottest op left in the pipeline (~1.0 ms/batch at 1024×4×4608):
the shifted MAC reads re-stream the signal and the two reductions pass
over the materialized residual again.

Here each 512-sample tile is read once (natural row-major blocks,
VMEM-transposed, previous-tile tail carried in scratch across the
sequential grid — same structure as ``zzsum_tile``), the ≤32-tap MAC
runs against per-lane tap columns, and the masked residual leaves in
natural layout together with tiny per-tile partials: eight 64-term
int32 zigzag sums (exactness gate below) and the tile's max-|residual|,
combined by XLA in int64/int32.

Exactness gates (caller-enforced, ``flacx.ops.lpc.predict_residual_fused``):
  * int32 MAC:  ``eff_bps + 1 + ceil(log2(Σ|taps|max))`` ≤ 31 — the same
    bound that already selects ``lpc_acc_dtype == int32``.
  * int32 zigzag partials: ``64 · 2 · 2^(eff_bps-1) · (1 + Σ|taps|max)``
    < 2^31, i.e. ``(1 + Σ|taps|max) < 2^(25 - eff_bps)`` — holds for all
    16-bit content (eff 17, Σ|taps| ≤ 12·16 = 192 at the default
    order-12/precision-5 config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # samples per tile (compute sublane axis)
LANES = 128         # rows (subframe candidates) per block
SEG = 64            # zigzag partial segment length (int32-exact)
PROWS = 16          # partial rows: 8 zigzag segments + 1 maxabs + pad
SEG_SPLIT = 128     # split-mode zigzag segment (4 lo + 4 hi + 1 maxabs)


def _mac_rows(ext, taps2d, shift, t: int, look: int, m: int,
              split: bool):
    """Predictor MAC for ``m`` samples: ``pred[i] = S[i] >> shift`` with
    ``S = Σ_j taps_j · x[i-1-j]``.

    ``ext`` is ``[look + m, LANES]`` i32 (lookbehind rows first),
    ``taps2d`` ``[t8, LANES]``, ``shift`` ``[1, LANES]`` with
    ``0 ≤ shift ≤ 15``.

    ``split=False``: single int32 accumulator (caller guarantees
    ``eff_bps + 1 + ceil(log2 Σ|taps|) ≤ 31``).

    ``split=True`` — TWO-LIMB int32 MAC for accumulators past 31 bits
    (the int64 XLA fallback is u32-pair emulated on TPU, ~4× VPU work
    and extra HBM passes): ``x = xh·2^16 + xl`` (``xl`` the unsigned
    low half), ``A = Σ t·xl``, ``B = Σ t·xh`` — no carries, and
    ``S >> s = B·2^(16-s) + (A >> s)`` exactly (``s ≤ 16``; the floor
    identity holds because ``B·2^(16-s)`` is an integer).  Per-sample
    overflow flags mark where int32 cannot hold ``pred``/``res``:
    with ``|A| ≤ 2^27`` (gate: ``ceil(log2 Σ|taps|) + 16 ≤ 27``) and
    ``|x| ≤ 2^(eff-1) ≤ 2^27`` (gate: ``eff ≤ 28``),
    ``|B| < 7·2^(12+s)`` ⟹ ``|pred| ≤ 7·2^28 + 2^27 < 2^31`` and
    ``|res| < 2^31`` (exact), while ``|B| ≥ 7·2^(12+s)`` ⟹ true
    ``|res| ≥ 6·2^28 > 2^30`` — the caller's int32-eligibility discard
    threshold — so flagged lanes are discarded by BOTH paths and the
    selection is bit-identical to the int64 reference arithmetic.

    Returns ``(pred [m, LANES] i32, ov [m, LANES] bool | None)``.
    """
    if not split:
        acc = jnp.zeros((m, LANES), jnp.int32)
        for jt in range(t):
            acc = acc + ext[look - 1 - jt: look - 1 - jt + m] \
                * taps2d[jt: jt + 1, :]
        return jnp.right_shift(acc, shift), None
    xl = ext & jnp.int32(0xFFFF)
    xh = ext >> 16
    a = jnp.zeros((m, LANES), jnp.int32)
    b = jnp.zeros((m, LANES), jnp.int32)
    for jt in range(t):
        tap = taps2d[jt: jt + 1, :]
        a = a + xl[look - 1 - jt: look - 1 - jt + m] * tap
        b = b + xh[look - 1 - jt: look - 1 - jt + m] * tap
    thr = jnp.int32(7) << (jnp.int32(12) + shift)
    ov = (b >= thr) | (b <= -thr)
    pred = (b << (jnp.int32(16) - shift)) + (a >> shift)
    return pred, ov


def split_mac_ok(eff_bps: int, sum_taps_max: int) -> bool:
    """Whether the two-limb int32 MAC (``_mac_rows`` split mode) is
    exact-or-flagged for this width/tap bound (see its docstring)."""
    return (eff_bps <= 28
            and max(1, sum_taps_max).bit_length() + 16 <= 27)


def _zzres_kernel(n: int, t: int, look: int, split: bool,
                  x_ref, taps_ref, meta_ref, zz_ref):
    """Whole-row fused predictor residual + zigzag for ONE channel block.

    ``x_ref`` block is ``[LANES, n]`` — one channel's block-column of
    the ``[B, C·N]`` view (frames on sublanes; the view is a free
    row-major reshape, and the block column does the channel slicing —
    no HBM-side channel copies).  The MAC runs in the transposed
    ``[n, LANES]`` layout (lag shifts = static sublane slices) against
    per-lane tap columns, the warmup mask is applied, and the
    zigzag-folded residual is written back in the same layout.
    """
    xt = x_ref[...].T                               # [n, LANES] i32
    lead = jnp.zeros((look, LANES), jnp.int32)
    ext = jnp.concatenate([lead, xt], axis=0)

    pred, _ = _mac_rows(ext, taps_ref[0, 0], meta_ref[0, 0, 0:1, :],
                        t, look, n, split)

    local = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
    res = jnp.where(local >= meta_ref[0, 0, 1:2, :], xt - pred,
                    jnp.int32(0))
    zz = (res << 1) ^ (res >> 31)
    zz_ref[...] = zz.T


def _zzres_chunk_kernel(n: int, t: int, look: int, split: bool,
                        x_ref, taps_ref, meta_ref, zz_ref, tail_ref):
    """Chunked variant of ``_zzres_kernel`` (``TILE``-sample grid steps,
    lookbehind carried in scratch) for rows too long to hold whole in
    VMEM — the hi-res block-16384 shape."""
    j = pl.program_id(2)
    cur = x_ref[...].T                          # [TILE, LANES] i32
    prev = tail_ref[...] * (j != 0)
    ext = jnp.concatenate([prev, cur], axis=0)
    tail_ref[...] = cur[TILE - look:]

    pred, _ = _mac_rows(ext, taps_ref[0, 0], meta_ref[0, 0, 0:1, :],
                        t, look, TILE, split)

    local = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    nt = -(-n // TILE)
    in_tail = (local < jnp.int32(n - (nt - 1) * TILE)) | (j != nt - 1)
    valid = ((local >= meta_ref[0, 0, 1:2, :]) | (j != 0)) & in_tail
    res = jnp.where(valid, cur - pred, jnp.int32(0))
    zz = (res << 1) ^ (res >> 31)
    zz_ref[...] = zz.T


@functools.partial(jax.jit, static_argnames=("split", "interpret"))
def zigzag_residual_tiles(x: jnp.ndarray, taps: jnp.ndarray,
                          shift: jnp.ndarray, order: jnp.ndarray,
                          split: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """Masked zigzag residual of the CHOSEN predictor, one HBM pass.

    The estimate-mode encoder's post-selection chain (fixed residual
    recompute → fixed/LPC merge → warmup mask → zigzag) ran as ~6 XLA
    fusions plus two layout copies (~14% of the r3 batch).  Here the
    merged per-channel taps drive one MAC and the zigzag leaves in the
    emit kernel's natural layout.  Rows longer than 8192 samples take
    the chunked kernel (``TILE`` grid steps, lookbehind in scratch).

    Args:
      x: ``[B, C, N]`` int32 selected-channel samples, ``B`` a multiple
        of 128 (``N % 128 == 0`` for the whole-row path).
      taps: ``[B, C, T]`` int32 merged taps (fixed or LPC per lane, zero
        beyond each lane's order), ``T ≤ 32``.
      shift: ``[B, C]`` int32 ≥ 0 (0 for fixed lanes).
      order: ``[B, C]`` int32.
      split: two-limb int32 MAC for widths past the single-int32 bound
        (gate :func:`split_mac_ok`).  Exact for every lane the encoder
        can select: chosen LPC lanes passed the ``maxabs < 2^30``
        eligibility check (which is overflow-flagged in
        :func:`lpc_residual_stats`), fixed-predictor lanes have
        ``Σ|taps| ≤ 15``.
    Returns:
      ``zz [B, C, N]`` int32 — bit-identical to
      ``zigzag(predict_residual(x, taps, shift)) * (i >= order)``.

    Exactness gate (caller-enforced): int32 MAC bound as
    :func:`lpc_residual_tiles`, or ``split``.
    """
    b, c, n = x.shape
    t = taps.shape[-1]
    assert b % LANES == 0 and t <= 32
    look = -(-(t + 1) // 8) * 8
    grid_b = b // LANES

    t8 = -(-t // 8) * 8
    taps_t = jnp.pad(taps, ((0, 0), (0, 0), (0, t8 - t))) \
        .reshape(grid_b, LANES, c, t8).transpose(0, 2, 3, 1)
    meta = jnp.stack([shift.astype(jnp.int32), order.astype(jnp.int32)],
                     axis=-1)
    meta_t = jnp.pad(meta, ((0, 0), (0, 0), (0, 6))) \
        .reshape(grid_b, LANES, c, 8).transpose(0, 2, 3, 1)

    if n <= 8192 and n % 128 == 0:
        zz = pl.pallas_call(
            functools.partial(_zzres_kernel, n, t, look, split),
            grid=(grid_b, c),
            in_specs=[
                pl.BlockSpec((LANES, n), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t8, LANES),
                             lambda i, j: (i, j, j - j, j - j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda i, j: (i, j, j - j, j - j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LANES, n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c * n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x.reshape(b, c * n), taps_t, meta_t)
        return zz.reshape(b, c, n)

    nt = -(-n // TILE)
    npad = nt * TILE
    if npad != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, npad - n)))
    zz = pl.pallas_call(
        functools.partial(_zzres_chunk_kernel, n, t, look, split),
        grid=(grid_b, c, nt),
        in_specs=[
            pl.BlockSpec((LANES, TILE),
                         lambda i, ch, j: (i, ch * nt + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t8, LANES),
                         lambda i, ch, j: (i, ch, j - j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, LANES),
                         lambda i, ch, j: (i, ch, j - j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, TILE),
                               lambda i, ch, j: (i, ch * nt + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c * npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((look, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(b, c * npad), taps_t, meta_t)
    return zz.reshape(b, c, npad)[..., :n]


def _lpcres_kernel(n: int, t: int, look: int, bv: int | None,
                   x_ref, taps_ref, meta_ref, res_ref, part_ref, tail_ref):
    j = pl.program_id(1)
    cur = x_ref[...].T                          # [TILE, LANES] i32
    prev = tail_ref[...] * (j != 0)
    ext = jnp.concatenate([prev, cur], axis=0)  # [look+TILE, LANES]
    tail_ref[...] = cur[TILE - look:]

    acc = jnp.zeros((TILE, LANES), jnp.int32)
    for jt in range(t):
        acc = acc + ext[look - 1 - jt: look - 1 - jt + TILE] \
            * taps_ref[0, jt: jt + 1, :]
    pred = jnp.right_shift(acc, meta_ref[0, 0:1, :])   # shift ≥ 0

    # warmup mask bites only in tile 0 (order ≤ 32 < TILE) and the
    # padding mask only in the last tile — local iota + scalar tile
    # predicates avoid i64 program-id arithmetic (see zzsum_tile)
    local = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    nt = -(-n // TILE)
    in_tail = (local < jnp.int32(n - (nt - 1) * TILE)) | (j != nt - 1)
    valid = ((local >= meta_ref[0, 1:2, :]) | (j != 0)) & in_tail
    res = jnp.where(valid, cur - pred, jnp.int32(0))
    rt = res.T
    res_ref[...] = rt if bv is None else rt.reshape(LANES // bv, bv, TILE)

    zz = (res << 1) ^ (res >> 31)               # nonneg, masked zeros
    zzp = jnp.sum(zz.reshape(TILE // SEG, SEG, LANES), axis=1,
                  dtype=jnp.int32)              # [8, LANES] exact
    mab = jnp.max(jnp.abs(res), axis=0)[None, :]
    pad = jnp.zeros((PROWS - TILE // SEG - 1, LANES), jnp.int32)
    part_ref[0, :, :] = jnp.concatenate([zzp, mab, pad], axis=0)


def _lpcres_stats_kernel(n: int, t: int, look: int, bv: int | None,
                         split: bool,
                         x_ref, taps_ref, meta_ref, part_ref, tail_ref):
    """``_lpcres_kernel`` minus the residual write (selection stats only).

    The estimate-mode encoder only needs ``(lzz, maxabs)`` from the
    per-virtual-channel best-order pass — the residual itself is
    recomputed post-selection by :func:`zigzag_residual_tiles` — so
    skipping the ``[R, N]`` residual write saves its whole HBM stream.

    ``split=True`` runs the two-limb int32 MAC (``_mac_rows``) for
    widths past the single-int32 bound (hi-res 24-bit / order 32) and
    emits SPLIT zigzag partials (low/high 16-bit halves over
    ``SEG_SPLIT`` segments — int32-exact for every keepable lane, i.e.
    whenever ``max|res| < 2^30``); overflow-flagged samples force
    ``maxabs ≥ 2^30`` so the caller's eligibility discard matches the
    int64 reference arithmetic bit-for-bit.
    """
    j = pl.program_id(1)
    cur = x_ref[...]
    if bv is not None:
        cur = cur.reshape(LANES, TILE)
    cur = cur.T                                 # [TILE, LANES] i32
    prev = tail_ref[...] * (j != 0)
    ext = jnp.concatenate([prev, cur], axis=0)
    tail_ref[...] = cur[TILE - look:]

    pred, ov = _mac_rows(ext, taps_ref[0], meta_ref[0, 0:1, :],
                         t, look, TILE, split)

    local = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    nt = -(-n // TILE)
    in_tail = (local < jnp.int32(n - (nt - 1) * TILE)) | (j != nt - 1)
    valid = ((local >= meta_ref[0, 1:2, :]) | (j != 0)) & in_tail
    res = jnp.where(valid, cur - pred, jnp.int32(0))
    if ov is not None:
        # flagged samples: pin |res| at the discard threshold (any
        # value ≥ 2^30 discards the lane, both here and in int64)
        res = jnp.where(valid & ov, jnp.int32(1) << 30, res)

    mab = jnp.max(jnp.abs(res), axis=0)[None, :]
    if split:
        zz = ((res << 1) ^ (res >> 31)).astype(jnp.uint32)
        zzr = zz.reshape(TILE // SEG_SPLIT, SEG_SPLIT, LANES)
        zzp_lo = jnp.sum((zzr & jnp.uint32(0xFFFF)).astype(jnp.int32),
                         axis=1, dtype=jnp.int32)
        zzp_hi = jnp.sum((zzr >> 16).astype(jnp.int32), axis=1,
                         dtype=jnp.int32)
        rows = 2 * (TILE // SEG_SPLIT)
        pad = jnp.zeros((PROWS - rows - 1, LANES), jnp.int32)
        part_ref[0, :, :] = jnp.concatenate([zzp_lo, zzp_hi, mab, pad],
                                            axis=0)
    else:
        zz = (res << 1) ^ (res >> 31)
        zzp = jnp.sum(zz.reshape(TILE // SEG, SEG, LANES), axis=1,
                      dtype=jnp.int32)
        pad = jnp.zeros((PROWS - TILE // SEG - 1, LANES), jnp.int32)
        part_ref[0, :, :] = jnp.concatenate([zzp, mab, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("split", "interpret"))
def lpc_residual_stats(x: jnp.ndarray, taps: jnp.ndarray,
                       shift: jnp.ndarray, order: jnp.ndarray,
                       split: bool = False,
                       interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Selection statistics of the masked LPC residual, no residual write.

    Args as :func:`lpc_residual_tiles` except ``x`` may be ``[B, V, N]``
    (``V`` dividing 128) — read through a 3D block spec, so no
    ``[R, N]`` reshape/retiling copy is materialized.  ``split=True``
    selects the two-limb int32 MAC (gate: :func:`split_mac_ok`) for
    widths past the single-int32 bound.
    Returns ``(lzz [lead] int64, maxabs [lead] int32)``.
    """
    lead = x.shape[:-1]
    n = x.shape[-1]
    r = 1
    for d in lead:
        r *= d
    t = taps.shape[-1]
    assert r % LANES == 0 and t <= 32
    look = -(-(t + 1) // 8) * 8
    nt = -(-n // TILE)
    bv = None
    if x.ndim == 3 and LANES % x.shape[1] == 0:
        bv = x.shape[1]
        if nt * TILE != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, nt * TILE - n)))
        x_spec = pl.BlockSpec((LANES // bv, bv, TILE),
                              lambda i, j: (i, j - j, j),
                              memory_space=pltpu.VMEM)
    else:
        x = x.reshape(r, n)
        if nt * TILE != n:
            x = jnp.pad(x, ((0, 0), (0, nt * TILE - n)))
        x_spec = pl.BlockSpec((LANES, TILE), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)

    grid_r = r // LANES
    t8 = -(-t // 8) * 8
    taps_t = jnp.pad(taps.reshape(r, t), ((0, 0), (0, t8 - t))) \
        .reshape(grid_r, LANES, t8).transpose(0, 2, 1)
    meta = jnp.stack([shift.reshape(r).astype(jnp.int32),
                      order.reshape(r).astype(jnp.int32)], axis=-1)
    meta_t = jnp.pad(meta, ((0, 0), (0, 6))) \
        .reshape(grid_r, LANES, 8).transpose(0, 2, 1)

    parts = pl.pallas_call(
        functools.partial(_lpcres_stats_kernel, n, t, look, bv, split),
        grid=(grid_r, nt),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, t8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PROWS, LANES), lambda i, j: (j, i - i, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, PROWS, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((look, LANES), jnp.int32)],
        interpret=interpret,
    )(x, taps_t, meta_t)

    if split:
        half = TILE // SEG_SPLIT
        lo = jnp.sum(parts[:, :half, :].astype(jnp.int64), axis=(0, 1))
        hi = jnp.sum(parts[:, half: 2 * half, :].astype(jnp.int64),
                     axis=(0, 1))
        lzz = ((hi << 16) + lo).reshape(lead)
        maxabs = jnp.max(parts[:, 2 * half, :], axis=0).reshape(lead)
        return lzz, maxabs
    lzz = jnp.sum(parts[:, : TILE // SEG, :].astype(jnp.int64),
                  axis=(0, 1)).reshape(lead)
    maxabs = jnp.max(parts[:, TILE // SEG, :], axis=0).reshape(lead)
    return lzz, maxabs


@functools.partial(jax.jit, static_argnames=("out_lead", "interpret"))
def lpc_residual_tiles(x: jnp.ndarray, taps: jnp.ndarray,
                       shift: jnp.ndarray, order: jnp.ndarray,
                       out_lead: tuple[int, int] | None = None,
                       interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked LPC residuals + zigzag sums + max-|res|, one HBM pass.

    Args:
      x: ``[R, N]`` int32 samples, ``R`` a multiple of 128.
      taps: ``[R, T]`` int32 (``T ≤ 32``, zero beyond each row's order).
      shift: ``[R]`` int32 ≥ 0.
      order: ``[R]`` int32 (positions ``i < order`` zeroed in the output).
      out_lead: optional ``(B, V)`` with ``B·V == R`` and ``V | 128`` —
        the residual is then returned as ``[B, V, N]`` written directly
        in that shape (see layout note below).
    Returns:
      ``(res [R, N] or [B, V, N] int32, lzz [R] int64, maxabs [R] int32)``
      — bit-identical to ``predict_residual`` → mask → reduce.
    """
    r, n = x.shape
    t = taps.shape[-1]
    assert r % LANES == 0 and t <= 32
    look = -(-(t + 1) // 8) * 8
    nt = -(-n // TILE)
    if nt * TILE != n:
        x = jnp.pad(x, ((0, 0), (0, nt * TILE - n)))

    grid_r = r // LANES
    t8 = -(-t // 8) * 8
    taps_t = jnp.pad(taps, ((0, 0), (0, t8 - t))) \
        .reshape(grid_r, LANES, t8).transpose(0, 2, 1)
    meta = jnp.stack([shift.astype(jnp.int32), order.astype(jnp.int32)],
                     axis=-1)
    meta_t = jnp.pad(meta, ((0, 0), (0, 6))) \
        .reshape(grid_r, LANES, 8).transpose(0, 2, 1)

    # The residual leaves in the caller's [B, V, N] shape when V divides
    # LANES: the write is the same contiguous block, but declaring the
    # 3D shape here lets XLA keep its preferred tiling for the gather /
    # select consumers instead of inserting a whole-array retiling pass
    # after a [R, N] → [B, V, N] reshape (~0.23 ms/batch profiled).
    if (out_lead is not None and len(out_lead) == 2
            and out_lead[0] * out_lead[1] == r
            and LANES % out_lead[1] == 0):
        bv = out_lead[1]
        res_shape = (r // bv, bv, nt * TILE)
        res_spec = pl.BlockSpec((LANES // bv, bv, TILE),
                                lambda i, j: (i, j - j, j),
                                memory_space=pltpu.VMEM)
    else:
        bv = None
        res_shape = (r, nt * TILE)
        res_spec = pl.BlockSpec((LANES, TILE), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)

    res, parts = pl.pallas_call(
        functools.partial(_lpcres_kernel, n, t, look, bv),
        grid=(grid_r, nt),
        in_specs=[
            pl.BlockSpec((LANES, TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            res_spec,
            pl.BlockSpec((1, PROWS, LANES), lambda i, j: (j, i - i, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(res_shape, jnp.int32),
            jax.ShapeDtypeStruct((nt, PROWS, r), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((look, LANES), jnp.int32)],
        interpret=interpret,
    )(x, taps_t, meta_t)

    lzz = jnp.sum(parts[:, : TILE // SEG, :].astype(jnp.int64),
                  axis=(0, 1))
    maxabs = jnp.max(parts[:, TILE // SEG, :], axis=0)
    return res[..., :n], lzz, maxabs


def _allorder_stats_kernel(n: int, p_max: int, t8: int, look: int,
                           bv: int | None,
                           x_ref, taps_ref, shifts_ref, part_ref,
                           tail_ref):
    """Selection statistics for EVERY LPC order in one pass over ``x``.

    The exact-order-search encoder needs ``(Σ zigzag(res_o), max|res_o|)``
    for all orders ``o = 1..P`` per (frame, virtual channel); as XLA this
    materializes the full ``[B, V, P, N]`` residual stack (reference
    semantics flac/encoder.py:362-420 — one residual per candidate
    order), ~0.9 GB per headline batch.  Here the signal tile is read
    once and the per-order MACs (``Σ_o o ≈ P²/2`` multiply-adds per
    sample — the same FLOPs XLA spends) run entirely in VMEM, emitting
    only the tiny zigzag partials + maxima per order.
    """
    j = pl.program_id(1)
    cur = x_ref[...]
    if bv is not None:
        cur = cur.reshape(LANES, TILE)
    cur = cur.T                                 # [TILE, LANES] i32
    prev = tail_ref[...] * (j != 0)
    ext = jnp.concatenate([prev, cur], axis=0)
    tail_ref[...] = cur[TILE - look:]

    local = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    nt = -(-n // TILE)
    in_tail = (local < jnp.int32(n - (nt - 1) * TILE)) | (j != nt - 1)

    rows_out = []
    pad = jnp.zeros((PROWS - TILE // SEG - 1, LANES), jnp.int32)
    for p in range(p_max):
        acc = jnp.zeros((TILE, LANES), jnp.int32)
        for jt in range(p + 1):
            acc = acc + ext[look - 1 - jt: look - 1 - jt + TILE] \
                * taps_ref[0, p * t8 + jt: p * t8 + jt + 1, :]
        pred = jnp.right_shift(acc, shifts_ref[0, p: p + 1, :])
        valid = ((local >= p + 1) | (j != 0)) & in_tail
        res = jnp.where(valid, cur - pred, jnp.int32(0))
        zz = (res << 1) ^ (res >> 31)
        zzp = jnp.sum(zz.reshape(TILE // SEG, SEG, LANES), axis=1,
                      dtype=jnp.int32)
        mab = jnp.max(jnp.abs(res), axis=0)[None, :]
        rows_out += [zzp, mab, pad]
    part_ref[0] = jnp.concatenate(rows_out, axis=0)


def allorder_stats_ok(eff_bps: int, sum_taps_max: int) -> bool:
    """Exactness gate for :func:`lpc_allorder_stats` — single-int32 MAC
    AND int32 zigzag partials (same bounds as the module docstring)."""
    return (eff_bps + 1 + max(1, sum_taps_max).bit_length() <= 31
            and (1 + sum_taps_max) < (1 << max(25 - eff_bps, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def lpc_allorder_stats(x: jnp.ndarray, qcoefs: jnp.ndarray,
                       shifts: jnp.ndarray,
                       interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``(lzz, maxabs)`` of the masked residual at EVERY LPC order.

    Args:
      x: ``[B, V, N]`` int32 samples (``B·V`` a multiple of 128).
      qcoefs: ``[B, V, P, T]`` int32 quantized taps (row ``o-1`` is the
        order-``o`` predictor, zero beyond its order), ``T ≤ 32``.
      shifts: ``[B, V, P]`` int32 ≥ 0.
    Returns:
      ``(lzz [B, V, P] int64, maxabs [B, V, P] int32)`` — bit-identical
      to ``lpc_residuals_all`` → warmup-mask → reduce under the
      :func:`allorder_stats_ok` gate.
    """
    b, v, n = x.shape
    p_max, t = qcoefs.shape[-2], qcoefs.shape[-1]
    r = b * v
    assert r % LANES == 0 and t <= 32
    look = -(-(t + 1) // 8) * 8
    nt = -(-n // TILE)
    grid_r = r // LANES
    t8 = -(-t // 8) * 8

    bv = v if LANES % v == 0 else None
    if bv is not None:
        xin = x
        if nt * TILE != n:
            xin = jnp.pad(xin, ((0, 0), (0, 0), (0, nt * TILE - n)))
        x_spec = pl.BlockSpec((LANES // bv, bv, TILE),
                              lambda i, j: (i, j - j, j),
                              memory_space=pltpu.VMEM)
    else:
        xin = x.reshape(r, n)
        if nt * TILE != n:
            xin = jnp.pad(xin, ((0, 0), (0, nt * TILE - n)))
        x_spec = pl.BlockSpec((LANES, TILE), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)

    taps_t = jnp.pad(qcoefs.reshape(r, p_max, t),
                     ((0, 0), (0, 0), (0, t8 - t))) \
        .reshape(grid_r, LANES, p_max * t8).transpose(0, 2, 1)
    p8 = -(-p_max // 8) * 8
    shifts_t = jnp.pad(shifts.reshape(r, p_max).astype(jnp.int32),
                       ((0, 0), (0, p8 - p_max))) \
        .reshape(grid_r, LANES, p8).transpose(0, 2, 1)

    rows = p_max * PROWS
    parts = pl.pallas_call(
        functools.partial(_allorder_stats_kernel, n, p_max, t8, look, bv),
        grid=(grid_r, nt),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, p_max * t8, LANES),
                         lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p8, LANES), lambda i, j: (i, j - j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda i, j: (j, i - i, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, rows, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((look, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xin, taps_t, shifts_t)

    p4 = parts.reshape(nt, p_max, PROWS, r)
    lzz = jnp.sum(p4[:, :, : TILE // SEG, :].astype(jnp.int64),
                  axis=(0, 2)).transpose(1, 0).reshape(b, v, p_max)
    maxabs = jnp.max(p4[:, :, TILE // SEG, :], axis=0) \
        .transpose(1, 0).reshape(b, v, p_max)
    return lzz, maxabs
