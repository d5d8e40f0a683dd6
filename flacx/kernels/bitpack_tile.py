"""Pallas kernel: VMEM-resident bitstring merge for symbol tiles.

The XLA merge tree (``flacx.ops.bitpack.pack_symbols``) round-trips every
level through HBM, and its binary-decomposed word shifts multiply that
traffic by ``log2(cap)``.  This kernel runs the first ``log2(TILE)``
levels entirely in VMEM: a block of 128 tiles sits in lanes, each tile's
512 symbols in sublanes, and the tree merges adjacent strings in place.

Invariants per level k (region = ``2^(k+1)`` consecutive sublane rows =
one string pair):

* string j occupies rows ``[j·2^k, (j+1)·2^k)``, MSB-first, zero-padded,
* the ``bits`` array holds each string's total length at EVERY row of
  that string, so the pair's shift amount is region-constant and the
  Mosaic-unsupported per-lane dynamic row shift decomposes into static
  ``pltpu.roll`` + masks,
* rolls never move data across region boundaries (masked explicitly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # symbols per tile (= output capacity in words)
LANES = 128         # tiles processed per kernel instance


#: span at which `_tile_kernel` switches from the region-mask formulation
#: to per-pair static slices: shallow levels have many regions (static
#: slicing would trace hundreds of tiny merges) while deep levels have few
#: pairs, where the slice formulation drops the full-tile `la`
#: replication, `is_odd` masks and per-stage region predicates — the
#: shift amounts become [lanes]-wide scalars per pair.
_SLICE_SPAN = 16


def _tile_kernel(lanes, values_ref, lengths_ref, la_ref, words_ref):
    v = values_ref[0]                          # [TILE, lanes] u32
    l = lengths_ref[0]                         # [TILE, lanes] i32

    # level 0: MSB-align each symbol in its own row
    buf = jnp.where(l > 0, v << ((32 - l.astype(jnp.uint32)) & 31),
                    jnp.uint32(0))

    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, lanes), 0)
    levels = TILE.bit_length() - 1             # log2(TILE)

    off = 0
    for k in range(levels):
        span = 1 << k
        pairs = TILE >> (k + 1)
        la_p = la_ref[0, off: off + pairs, :]  # even-string lengths
        off += pairs
        if span >= _SLICE_SPAN:
            # ---- deep levels: static per-pair slices (the upper
            # kernel's formulation).  Cyclic rolls need no wrap masks:
            # a wrapped source row lies in [0, t), which stays zero
            # because the applied shift obeys a + t <= w <= span; the
            # carry roll (by 1) only contributes where r > 0, which
            # forces a < span, keeping row 0 zero.
            regions = []
            for p in range(pairs):
                r0 = 2 * p * span
                delta = span * 32 - la_p[p]    # [lanes]
                w = (delta >> 5)[None, :]
                r = (delta & 31).astype(jnp.uint32)[None, :]
                od = jnp.concatenate(
                    [jnp.zeros((span, lanes), jnp.uint32),
                     buf[r0 + span: r0 + 2 * span]], axis=0)
                t = 1
                while t <= span:
                    rolled = pltpu.roll(od, jnp.int32(2 * span - t), axis=0)
                    od = jnp.where((w & t) != 0, rolled, od)
                    t <<= 1
                nxt = pltpu.roll(od, jnp.int32(2 * span - 1), axis=0)
                od = jnp.where(r > 0,
                               (od << r) | (nxt >> ((32 - r) & 31)), od)
                regions.append(jnp.concatenate(
                    [buf[r0: r0 + span] | od[:span], od[span:]], axis=0))
            buf = jnp.concatenate(regions, axis=0) if len(regions) > 1 \
                else regions[0]
            continue

        # ---- shallow levels: region masks over the whole tile.
        is_odd = ((row >> k) & 1) == 1

        # the even (first) string's length, constant over the whole
        # region — precomputed XLA-side (tiny cumsums) and replicated to
        # region rows here, replacing the in-kernel ``bits`` tracking
        # (three full-tile rolls per level)
        la = jnp.broadcast_to(la_p[:, None, :], (pairs, 2 * span, lanes)
                              ).reshape(TILE, lanes)
        delta = span * 32 - la                 # upward shift of the odd part
        w = delta >> 5
        r = (delta & 31).astype(jnp.uint32)

        odd = jnp.where(is_odd, buf, jnp.uint32(0))
        # word-granularity move: staged static rolls.  Cross-region
        # contamination (region j's partially-shifted odd data read by
        # region j-1's tail rows) requires t + a_j > span with a_j < t,
        # i.e. 2t > span — impossible for power-of-two t except the final
        # t = span step, so only that step masks off foreign regions.
        t = 1
        while t <= span:
            rolled = pltpu.roll(odd, jnp.int32(TILE - t), axis=0)
            if t == span:
                same_region = ((row + t) >> (k + 1)) == (row >> (k + 1))
                rolled = jnp.where(same_region, rolled, jnp.uint32(0))
            odd = jnp.where((w & t) != 0, rolled, odd)
            t <<= 1
        # bit-granularity: shift left by r with carry from the next row
        nxt_ok = ((row + 1) >> (k + 1)) == (row >> (k + 1))
        nxt = jnp.where(nxt_ok, pltpu.roll(odd, jnp.int32(TILE - 1), axis=0),
                        jnp.uint32(0))
        odd = jnp.where(r > 0, (odd << r) | (nxt >> ((32 - r) & 31)), odd)

        even = jnp.where(is_odd, jnp.uint32(0), buf)
        buf = even | odd

    words_ref[0] = buf


def merge_level_counts(s: int) -> int:
    """Number of pairwise-merge levels for an S-string stack (any S ≥ 1
    — an odd level's last string passes through unpaired)."""
    levels = 0
    while s > 1:
        levels += 1
        s = (s + 1) // 2
    return levels


def _bswap32(w):
    return ((w >> 24) | ((w >> 8) & jnp.uint32(0xFF00))
            | ((w << 8) & jnp.uint32(0xFF0000)) | (w << 24))


def _upper_kernel(n_strings: int, lanes: int, cap0: int, out_rows: int,
                  bswap: bool, words_ref, *rest):
    """Merge ``n_strings`` ``cap0``-word strings per lane fully in VMEM.

    The XLA upper tree costs ~20 ms/batch at 1024 frames: every level
    re-streams the whole ``[B, S, cap]`` buffer through HBM once per
    staged word shift (log2(cap) passes).  Here the frame's entire
    word buffer lives in VMEM ([rows, lanes] with frames on lanes) and
    the same binary-decomposed rolls run at VMEM bandwidth.

    Regions are STATIC row slices (no region masks or per-row length
    replication; the only dynamic data are the per-lane even-string bit
    lengths ``la`` fed per level), and every merged region is CLAMPED to
    ``out_rows`` — string contents provably never exceed the frame's
    byte capacity, so deep levels shrink instead of doubling, which both
    bounds the VMEM working set and skips provably-empty rows.

    ``n_strings`` may be ANY count ≥ 2 (round 5): an odd level's last
    string passes through zero-padded to the level's row capacity, so
    callers no longer pad string stacks to a power of two (10 of the
    headline config's 32 strings were zero pads riding every level).
    """
    levels = merge_level_counts(n_strings)
    las = rest[:levels]
    out_ref = rest[levels]
    buf = words_ref[0]                          # [rows, lanes] u32

    r_in = cap0
    s = n_strings
    for k in range(levels):
        pairs = s // 2
        r_out = min(2 * r_in, out_rows)
        la_ref = las[k]
        regions = []
        for p in range(pairs):
            r0 = 2 * p * r_in
            la = la_ref[0, p]                    # [lanes] i32
            delta = r_in * 32 - la               # upward shift of B, bits
            w = (delta >> 5)[None, :]
            rbits = (delta & 31).astype(jnp.uint32)[None, :]
            od = jnp.concatenate(
                [jnp.zeros((r_in, lanes), jnp.uint32),
                 buf[r0 + r_in: r0 + 2 * r_in]], axis=0)
            # cyclic rolls need no wrap masks: a wrapped source row lies in
            # [0, t), which stays zero because the applied shift obeys
            # a + t <= w <= r_in; the carry roll (by 1) only contributes
            # where rbits > 0, which forces a < r_in, keeping row 0 zero.
            t = 1
            while t <= r_in:
                rolled = pltpu.roll(od, jnp.int32(2 * r_in - t), axis=0)
                od = jnp.where((w & t) != 0, rolled, od)
                t <<= 1
            nxt = pltpu.roll(od, jnp.int32(2 * r_in - 1), axis=0)
            od = jnp.where(rbits > 0,
                           (od << rbits) | (nxt >> ((32 - rbits) & 31)), od)
            merged = od[:r_out]
            if r_out <= r_in:
                merged = buf[r0: r0 + r_out] | merged
            else:
                merged = jnp.concatenate(
                    [buf[r0: r0 + r_in] | merged[:r_in],
                     merged[r_in:]], axis=0)
            regions.append(merged)
        if s % 2:
            tail = buf[2 * pairs * r_in: 2 * pairs * r_in
                       + min(r_in, r_out)]
            if r_out > r_in:
                tail = jnp.concatenate(
                    [tail, jnp.zeros((r_out - r_in, lanes), jnp.uint32)],
                    axis=0)
            regions.append(tail)
        buf = jnp.concatenate(regions, axis=0) if len(regions) > 1 \
            else regions[0]
        s = pairs + s % 2
        r_in = r_out

    # optional in-VMEM byteswap: the caller's byte split then becomes a
    # free bitcast instead of a shift/or pass over the whole word array
    out_ref[0] = _bswap32(buf) if bswap else buf


@functools.partial(jax.jit, static_argnames=("interpret", "lanes",
                                             "out_rows"))
def merge_strings(words: jnp.ndarray, bits: jnp.ndarray,
                  interpret: bool = False, lanes: int = 128,
                  out_rows: int | None = None) -> jnp.ndarray:
    """Merge each frame's ``[S, cap]``-word strings into one string.

    Args:
      words: ``[F, S, cap]`` u32 MSB-first strings (S a power of two,
        F a multiple of ``lanes``).
      bits: ``[F, S]`` i32 string bit lengths (each ≤ cap·32).
      out_rows: word capacity of the result (caller guarantees every
        frame's TOTAL bits fit: ``sum(bits[i]) ≤ out_rows·32``); merged
        regions are clamped to it, bounding VMEM and skipping
        provably-empty deep-level rows.  None = no clamp.
    Returns:
      ``[F, out_rows]`` u32 packed words (the frame's stream at row 0).
    """
    f, s, cap = words.shape
    assert s >= 2 and f % lanes == 0
    rows = s * cap
    if out_rows is None or out_rows > rows:
        out_rows = rows
    grid = f // lanes
    levels = merge_level_counts(s)

    # per-level even-string lengths [F, pairs] (tiny XLA-side cumsums);
    # an odd level's last string passes through
    las = []
    cur = bits
    for _ in range(levels):
        pairs = cur.shape[1] // 2
        las.append(cur[:, 0: 2 * pairs: 2])
        nxt = cur[:, 0: 2 * pairs: 2] + cur[:, 1: 2 * pairs: 2]
        if cur.shape[1] % 2:
            nxt = jnp.concatenate([nxt, cur[:, 2 * pairs:]], axis=1)
        cur = nxt

    wt = (words.reshape(grid, lanes, rows).transpose(0, 2, 1))
    la_t = [a.reshape(grid, lanes, -1).transpose(0, 2, 1) for a in las]

    block = lambda r: pl.BlockSpec((1, r, lanes),
                                   lambda g: (g, g - g, g - g),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_upper_kernel, s, lanes, cap, out_rows, False),
        grid=(grid,),
        in_specs=[block(rows)] + [block(a.shape[1]) for a in la_t],
        out_specs=block(out_rows),
        out_shape=jax.ShapeDtypeStruct((grid, out_rows, lanes), jnp.uint32),
        # Mosaic's default scoped-VMEM budget (16 MB) undercounts the
        # reuse here; the working set genuinely fits once buffers are
        # shared, and raising the budget lets it allocate the stack.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wt, *la_t)
    return out.transpose(0, 2, 1).reshape(f, out_rows)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_tiles(values: jnp.ndarray, lengths: jnp.ndarray,
                interpret: bool = False
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge 512-symbol tiles into packed 512-word strings.

    Args:
      values: ``[n_tiles, TILE]`` u32 (``n_tiles`` a multiple of LANES,
        symbol values ``< 2**length``).
      lengths: ``[n_tiles, TILE]`` i32 (each ≤ 32).
    Returns:
      ``(words [n_tiles, TILE] u32 MSB-first, bits [n_tiles] i32)``.
    """
    n_tiles = values.shape[0]
    grid = n_tiles // LANES
    vt = values.reshape(grid, LANES, TILE).transpose(0, 2, 1)
    lt = lengths.reshape(grid, LANES, TILE).transpose(0, 2, 1)

    # per-level even-string lengths, all levels concatenated along rows
    # (level k contributes TILE >> (k+1) rows): tiny XLA-side cumsums
    # replace the kernel's per-row ``bits`` replication, and the final
    # level's total falls out for free
    las = []
    cur = lengths
    for _ in range(TILE.bit_length() - 1):
        las.append(cur[:, 0::2])
        cur = cur[:, 0::2] + cur[:, 1::2]
    bits = cur[:, 0]                                # [n_tiles] total
    la_all = jnp.concatenate(las, axis=1)           # [n_tiles, TILE-1]
    la_all = jnp.pad(la_all, ((0, 0), (0, 1)))
    la_t = la_all.reshape(grid, LANES, TILE).transpose(0, 2, 1)

    words = pl.pallas_call(
        functools.partial(_tile_kernel, LANES),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, TILE, LANES), jnp.uint32),
        interpret=interpret,
    )(vt, lt, la_t)

    words = words.transpose(0, 2, 1).reshape(n_tiles, TILE)
    return words, bits


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_tiles_t(vt: jnp.ndarray, lt: jnp.ndarray,
                  interpret: bool = False
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`merge_tiles` on PRE-TRANSPOSED tile blocks.

    Args:
      vt: ``[G, TILE, LANES]`` u32 symbol values (tile content on
        sublanes, tiles on lanes — e.g. straight out of
        ``flacx.kernels.emit_tile``).
      lt: ``[G, TILE, LANES]`` i32 symbol lengths.
    Returns:
      ``(words [G, TILE, LANES] u32 MSB-first — still transposed,
      bits [G, LANES] i32)`` — no HBM transpose on either side.
    """
    grid = vt.shape[0]
    las = []
    cur = lt
    for _ in range(TILE.bit_length() - 1):
        las.append(cur[:, 0::2, :])
        cur = cur[:, 0::2, :] + cur[:, 1::2, :]
    bits = cur[:, 0, :]
    la_t = jnp.concatenate(las, axis=1)             # [G, TILE-1, LANES]
    la_t = jnp.pad(la_t, ((0, 0), (0, 1), (0, 0)))

    l = vt.shape[-1]
    words = pl.pallas_call(
        functools.partial(_tile_kernel, l),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TILE, l), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, l), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, l), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, l), lambda g: (g, g - g, g - g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, TILE, l), jnp.uint32),
        interpret=interpret,
    )(vt, lt, la_t)
    return words, bits


def _pair_kernel(r_in: int, r_out: int, lanes: int,
                 a_ref, la_ref, out_ref):
    """Merge ONE adjacent string pair (level step of the upper tree).

    ``a_ref`` block is ``[1, 2·r_in, lanes]`` (strings A then B),
    ``la_ref`` ``[1, 1, 8, lanes]`` with A's bit length replicated on
    sublanes.  Same roll/carry formulation as ``_upper_kernel``'s inner
    loop; one pair per grid step keeps VMEM bounded for stacks too tall
    to merge in a single kernel instance (hi-res segmented layouts
    reach 256 strings × 512 words × 128 lanes = 67 MB just for the
    input block)."""
    buf = a_ref[0]                               # [2·r_in, lanes] u32
    la = la_ref[0, 0, 0:1, :]                    # [1, lanes] i32
    delta = r_in * 32 - la
    w = delta >> 5
    r = (delta & 31).astype(jnp.uint32)
    od = jnp.concatenate([jnp.zeros((r_in, lanes), jnp.uint32),
                          buf[r_in:]], axis=0)
    t = 1
    while t <= r_in:
        rolled = pltpu.roll(od, jnp.int32(2 * r_in - t), axis=0)
        od = jnp.where((w & t) != 0, rolled, od)
        t <<= 1
    nxt = pltpu.roll(od, jnp.int32(2 * r_in - 1), axis=0)
    od = jnp.where(r > 0, (od << r) | (nxt >> ((32 - r) & 31)), od)
    if r_out <= r_in:
        out_ref[0] = buf[:r_out] | od[:r_out]
    else:
        out_ref[0] = jnp.concatenate(
            [buf[:r_in] | od[:r_in], od[r_in:r_out]], axis=0)


@functools.partial(jax.jit, static_argnames=("out_rows", "interpret"))
def merge_strings_t_leveled(wt: jnp.ndarray, bits: jnp.ndarray,
                            out_rows: int | None = None,
                            interpret: bool = False) -> jnp.ndarray:
    """:func:`merge_strings_t` semantics via one pallas call PER LEVEL.

    The single-call kernel holds the whole ``[S·cap, lanes]`` stack in
    VMEM — impossible for hi-res segmented stacks (≥ 67 MB).  Here each
    level round-trips the stack through HBM once (≈ 8 × 40 MB ≈ 0.4 ms
    at HBM peak for the worst case) and each grid step merges one pair
    in a bounded [1, 2·r, L] block.  Bit-identical to
    :func:`merge_strings_t`.
    """
    g, rows, l = wt.shape
    s = bits.shape[1]
    cap = rows // s
    assert s >= 2 and cap * s == rows
    if out_rows is None or out_rows > rows:
        out_rows = rows
    levels = merge_level_counts(s)

    cur = wt
    cur_bits = bits
    r_in = cap
    for _ in range(levels):
        ns = cur_bits.shape[1]
        pairs = ns // 2
        r_out = min(2 * r_in, out_rows)
        la = cur_bits[:, 0: 2 * pairs: 2, :]       # [G, pairs, L]
        la8 = jnp.broadcast_to(la[:, :, None, :], (g, pairs, 8, l))
        nxt = pl.pallas_call(
            functools.partial(_pair_kernel, r_in, r_out, l),
            grid=(g, pairs),
            in_specs=[
                pl.BlockSpec((1, 2 * r_in, l), lambda i, p: (i, p, p - p),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, l),
                             lambda i, p: (i, p, p - p, p - p),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r_out, l),
                                   lambda i, p: (i, p, p - p),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, pairs * r_out, l),
                                           jnp.uint32),
            # deep levels need ~4× the pair block (buf + od + roll
            # temporaries); the physical budget on v5e-class chips is
            # 128 MiB, so give the deepest pair (2×26k words × 128
            # lanes) headroom beyond the default 100 MB cap
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(cur, la8)
        nb = cur_bits[:, 0: 2 * pairs: 2, :] + cur_bits[:, 1: 2 * pairs: 2, :]
        if ns % 2:
            tail = cur[:, 2 * pairs * r_in: 2 * pairs * r_in
                       + min(r_in, r_out), :]
            if r_out > r_in:
                tail = jnp.concatenate(
                    [tail, jnp.zeros((g, r_out - r_in, l), jnp.uint32)],
                    axis=1)
            nxt = jnp.concatenate([nxt, tail], axis=1)
            nb = jnp.concatenate([nb, cur_bits[:, 2 * pairs:, :]], axis=1)
        cur, cur_bits = nxt, nb
        r_in = r_out
    return cur


@functools.partial(jax.jit, static_argnames=("lanes", "out_rows",
                                             "bswap", "interpret"))
def merge_strings_t(wt: jnp.ndarray, bits: jnp.ndarray,
                    lanes: int = 64, out_rows: int | None = None,
                    bswap: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """:func:`merge_strings` on PRE-TRANSPOSED string stacks.

    Args:
      wt: ``[G, S·cap, L]`` u32 — each lane's ``S`` strings of ``cap``
        words stacked on sublanes (``S`` a power of two); ``L`` a
        multiple of ``lanes`` (blocks of ``lanes`` lanes are processed
        per kernel instance via lane-block indexing — no data movement).
      bits: ``[G, S, L]`` i32 string bit lengths.
      out_rows: word capacity of the result (see :func:`merge_strings`).
    Returns:
      ``[G, out_rows, L]`` u32 packed words — still transposed.
    """
    g, rows, l = wt.shape
    s = bits.shape[1]
    cap = rows // s
    assert s >= 2 and l % lanes == 0 and cap * s == rows
    if out_rows is None or out_rows > rows:
        out_rows = rows
    levels = merge_level_counts(s)
    lsplit = l // lanes

    las = []
    cur = bits
    for _ in range(levels):
        pairs = cur.shape[1] // 2
        las.append(cur[:, 0: 2 * pairs: 2, :])
        nxt = cur[:, 0: 2 * pairs: 2, :] + cur[:, 1: 2 * pairs: 2, :]
        if cur.shape[1] % 2:
            nxt = jnp.concatenate([nxt, cur[:, 2 * pairs:, :]], axis=1)
        cur = nxt

    if lsplit == 1:
        # avoid //-and-% index arithmetic (i64 div trips Mosaic
        # legalization under x64) when there is no lane split
        block = lambda r: pl.BlockSpec(
            (1, r, lanes), lambda i: (i, i - i, i - i),
            memory_space=pltpu.VMEM)
    else:
        block = lambda r: pl.BlockSpec(
            (1, r, lanes), lambda i: (i // lsplit, i - i, i % lsplit),
            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_upper_kernel, s, lanes, cap, out_rows, bswap),
        grid=(g * lsplit,),
        in_specs=[block(rows)] + [block(a.shape[1]) for a in las],
        out_specs=block(out_rows),
        out_shape=jax.ShapeDtypeStruct((g, out_rows, l), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wt, *las)
    return out
