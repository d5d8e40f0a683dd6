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


def _tile_kernel(values_ref, lengths_ref, words_ref, bits_ref):
    v = values_ref[0]                          # [TILE, LANES] u32
    l = lengths_ref[0]                         # [TILE, LANES] i32

    # level 0: MSB-align each symbol in its own row
    buf = jnp.where(l > 0, v << ((32 - l.astype(jnp.uint32)) & 31),
                    jnp.uint32(0))
    bits = l

    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    levels = TILE.bit_length() - 1             # log2(TILE)

    for k in range(levels):
        span = 1 << k
        region = span << 1
        is_odd = ((row >> k) & 1) == 1

        # the even (first) string's length, constant over the whole region
        la = jnp.where(is_odd, pltpu.roll(bits, jnp.int32(span), axis=0), bits)
        delta = span * 32 - la                 # upward shift of the odd part
        w = delta >> 5
        r = (delta & 31).astype(jnp.uint32)

        odd = jnp.where(is_odd, buf, jnp.uint32(0))
        # word-granularity move: staged static rolls; sources from another
        # region are masked off (their rows read as zero)
        t = 1
        while t <= span:
            same_region = ((row + t) >> (k + 1)) == (row >> (k + 1))
            rolled = jnp.where(same_region, pltpu.roll(odd, jnp.int32(TILE - t), axis=0),
                               jnp.uint32(0))
            odd = jnp.where((w & t) != 0, rolled, odd)
            t <<= 1
        # bit-granularity: shift left by r with carry from the next row
        nxt_ok = ((row + 1) >> (k + 1)) == (row >> (k + 1))
        nxt = jnp.where(nxt_ok, pltpu.roll(odd, jnp.int32(TILE - 1), axis=0),
                        jnp.uint32(0))
        odd = jnp.where(r > 0, (odd << r) | (nxt >> ((32 - r) & 31)), odd)

        even = jnp.where(is_odd, jnp.uint32(0), buf)
        buf = even | odd

        # every row of the merged string holds its total length
        lb = jnp.where(is_odd, bits, pltpu.roll(bits, jnp.int32(TILE - span), axis=0))
        bits = la + lb

    words_ref[0] = buf
    bits_ref[0] = bits[:1, :]


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

    words, bits = pl.pallas_call(
        _tile_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, g - g, g - g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid, TILE, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((grid, 1, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(vt, lt)

    words = words.transpose(0, 2, 1).reshape(n_tiles, TILE)
    return words, bits.reshape(n_tiles)
