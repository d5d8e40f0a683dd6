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
