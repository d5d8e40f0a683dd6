"""Bit packer: variable-length symbol streams → packed bytes.

Replaces the reference's one-call-per-bit ``Put.uint`` funnel
(flac/binary.py:168-206, the #1 hot spot per SURVEY.md §3.4).

The production algorithm is a **hierarchical bitstring merge tree**: every
symbol becomes a 1-word MSB-aligned bitstring; ``log2(S)`` rounds of
pairwise concatenation (word-shift by binary decomposition + bit-shift +
OR — all elementwise, fully lane-parallel) fold the whole stream into one
packed buffer per row.  No gathers, no scatters, no sorts — measured ~50×
faster on TPU than scatter-add and ~500× faster than per-bit binary search
(both kept below for cross-validation).

Symbol contract: ``length ≤ 32`` bits per symbol and ``value < 2**length``.
Rice zero-runs are capped at 31 bits by the planner (``flacx.ops.rice``),
which keeps every slot within one word.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Largest legal symbol length for the tree packer (one u32 word).
MAX_SYMBOL_BITS = 32


def _merge_level(words: jnp.ndarray, bits: jnp.ndarray,
                 out_cap: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate adjacent bitstring pairs.

    Args:
      words: ``[B, S, cap]`` u32, MSB-first bitstrings (bits beyond each
        row's length are zero — the invariant that makes OR-merging exact).
      bits: ``[B, S]`` i32 lengths.
      out_cap: word capacity of merged strings (``>= ceil((la+lb)/32)``).
    Returns:
      ``(words [B, S//2, out_cap], bits [B, S//2])``.
    """
    a = words[:, 0::2]
    b_ = words[:, 1::2]
    la = bits[:, 0::2]
    lb = bits[:, 1::2]
    cap = words.shape[-1]

    pad = out_cap - cap
    a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
    x = jnp.pad(b_, ((0, 0), (0, 0), (0, pad)))

    # word-granularity placement of B at offset la: shift right by la>>5
    # words via binary decomposition (conditional static shifts)
    w0 = (la >> 5)[..., None]
    t = 1
    while t < out_cap:
        shifted = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))[..., :out_cap]
        x = jnp.where((w0 & t) != 0, shifted, x)
        t <<= 1

    # bit-granularity: shift right by r = la & 31 with cross-word carry
    r = (la & 31)[..., None].astype(jnp.uint32)
    prev = jnp.pad(x, ((0, 0), (0, 0), (1, 0)))[..., :out_cap]
    carry = jnp.where(r > 0, prev << ((32 - r) & 31), 0)
    x = (x >> r) | carry

    return a | x, la + lb


def words_to_bytes(data: jnp.ndarray) -> jnp.ndarray:
    """``[..., W]`` u32 MSB-first words → ``[..., 4W]`` u8 big-endian bytes.

    A byte-swap followed by a bitcast: the u8 view of the swapped u32
    array IS its bytes (bitcast element ``i`` = bits ``[8i, 8i+8)``), so
    XLA keeps the storage and skips the interleave-layout copy the
    ``stack(>>24, >>16, ...)`` formulation required.
    """
    sw = ((data << 24) | ((data & jnp.uint32(0xFF00)) << 8)
          | ((data >> 8) & jnp.uint32(0xFF00)) | (data >> 24))
    by = jax.lax.bitcast_convert_type(sw, jnp.uint8)
    return by.reshape(*data.shape[:-1], data.shape[-1] * 4)


def pack_symbols_words(values: jnp.ndarray, lengths: jnp.ndarray,
                       max_bytes: int,
                       use_tile_kernel: bool | None = None,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack per-row symbol streams into u32 words (merge-tree algorithm).

    Args:
      values: ``[B, S]`` uint32 symbol payloads (low bits, ``< 2**length``).
      lengths: ``[B, S]`` int32 bit lengths in ``0..32`` (0 = absent).
      max_bytes: static output capacity per row (multiple of 4).
      use_tile_kernel: run the lower tree levels in the Pallas VMEM kernel
        (``flacx.kernels.bitpack_tile``); None = auto (TPU backend only).
    Returns:
      ``(words u32 [B, max_bytes // 4] MSB-first, total_bits i32 [B])``;
      words beyond each row's stream are zero.  The byte form is
      ``words_to_bytes(words)``; callers that also need the frame CRC can
      fold it from the words (``crcfold.crc16_over_word_rows``) without
      re-reading the byte expansion.
    """
    b, s = values.shape
    cap_words = max_bytes // 4

    if use_tile_kernel is None:
        use_tile_kernel = jax.default_backend() == "tpu"

    from flacx.kernels.bitpack_tile import (LANES, TILE, merge_strings,
                                            merge_tiles)
    # tile path: pad only to whole 512-symbol tiles (the power-of-two
    # requirement applies to tile STRINGS, which are padded with empty
    # strings after the in-VMEM merge — at batch 1024/block 4608 this
    # keeps 13 provably-empty tiles per frame out of the lower kernel)
    s_tiles = -(-s // TILE)
    if (use_tile_kernel and s >= TILE and (b * s_tiles) % LANES == 0):
        if s_tiles * TILE != s:
            values = jnp.pad(values, ((0, 0), (0, s_tiles * TILE - s)))
            lengths = jnp.pad(lengths, ((0, 0), (0, s_tiles * TILE - s)))
        n_tiles = b * s_tiles
        tw, tb = merge_tiles(values.reshape(n_tiles, TILE),
                             lengths.reshape(n_tiles, TILE))
        # the in-VMEM upper merge handles ANY string count (odd levels
        # pass the last string through), so no zero-string padding there
        n_strings = s_tiles
        # VMEM-adaptive lane count: peak live set ≈ 3 arrays of
        # rows·lanes·4 B; keep it well under the ~16 MB VMEM budget
        rows = n_strings * TILE
        lanes = 128
        while lanes > 8 and 3 * rows * lanes * 4 > 12 << 20:
            lanes //= 2
        if (2 <= n_strings <= 32 and b % lanes == 0
                and max_bytes // 4 <= n_strings * TILE):
            # upper tree fully in VMEM too (~20 ms → sub-ms at batch 1024);
            # regions clamp to the frame byte capacity (rounded up)
            out_rows = min(n_strings * TILE,
                           (max_bytes // 4 + 2 + 511) // 512 * 512)
            packed = merge_strings(tw.reshape(b, n_strings, TILE),
                                   tb.reshape(b, n_strings), lanes=lanes,
                                   out_rows=out_rows)
            total_bits = tb.reshape(b, n_strings).sum(-1)
            return packed[:, : max_bytes // 4], total_bits
        # the XLA pairwise fallback tree halves evenly — pad to 2^m
        n_pow = 1
        while n_pow < s_tiles:
            n_pow <<= 1
        if n_pow != s_tiles:
            tw = jnp.pad(tw.reshape(b, s_tiles, TILE),
                         ((0, 0), (0, n_pow - s_tiles), (0, 0))
                         ).reshape(b * n_pow, TILE)
            tb = jnp.pad(tb.reshape(b, s_tiles),
                         ((0, 0), (0, n_pow - s_tiles))).reshape(-1)
        words = tw.reshape(b, n_pow, TILE)
        bits = tb.reshape(b, n_pow)
        cap = TILE
    else:
        # non-tile path merges pairwise from single symbols: pad the slot
        # count to a power of two so every level halves evenly
        s_pow = 1
        while s_pow < s:
            s_pow <<= 1
        if s_pow != s:
            values = jnp.pad(values, ((0, 0), (0, s_pow - s)))
            lengths = jnp.pad(lengths, ((0, 0), (0, s_pow - s)))
        # level 0: MSB-align each value in one word
        l32 = lengths.astype(jnp.uint32)
        words = jnp.where(lengths > 0,
                          values << ((32 - l32) & 31),
                          jnp.uint32(0))[..., None]
        bits = lengths
        cap = 1

    while words.shape[1] > 1:
        cap = min(cap * 2, cap_words + 2)
        words, bits = _merge_level(words, bits, cap)

    total_bits = bits[:, 0]
    return words[:, 0, :max_bytes // 4], total_bits


def pack_symbols(values: jnp.ndarray, lengths: jnp.ndarray,
                 max_bytes: int,
                 use_tile_kernel: bool | None = None,
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Byte-array form of :func:`pack_symbols_words` (same contract,
    returning ``bytes u8 [B, max_bytes]``)."""
    words, total_bits = pack_symbols_words(values, lengths, max_bytes,
                                           use_tile_kernel)
    return words_to_bytes(words), total_bits


# ---------------------------------------------------------------------------
# Reference implementations (kept for cross-validation in tests)


def pack_symbols_scatter(values: jnp.ndarray, lengths: jnp.ndarray,
                         max_bytes: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Word-pair scatter-add formulation (supports lengths > 32)."""
    b, s = values.shape
    w = max_bytes // 4
    ends = jnp.cumsum(lengths, axis=-1, dtype=jnp.int32)
    total_bits = ends[:, -1]
    e32 = ends + 32                       # one virtual word in front
    w1 = (e32 >> 5) - 1                   # virtual word holding the top bits
    sh = (32 * (w1 + 2) - e32).astype(jnp.uint32)  # 0..31
    v64 = values.astype(jnp.uint64) << sh
    hi = (v64 >> 32).astype(jnp.uint32)
    lo = v64.astype(jnp.uint32)
    khi = w1 - 1                          # drop the virtual word
    klo = khi + 1
    dead = lengths == 0
    khi = jnp.where(dead | (hi == 0), w, khi)
    klo = jnp.where(dead | (lo == 0), w, klo)
    rows = jnp.arange(b)[:, None]
    out = jnp.zeros((b, w + 1), jnp.uint32)
    out = out.at[rows, khi].add(hi, mode="drop")
    out = out.at[rows, klo].add(lo, mode="drop")
    data = out[:, :w]
    by = jnp.stack([data >> 24, data >> 16, data >> 8, data], axis=-1)
    return ((by & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(b, max_bytes),
            total_bits)


def pack_symbols_per_bit(values: jnp.ndarray, lengths: jnp.ndarray,
                         max_bytes: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-bit binary search formulation (simple, slow; oracle)."""
    b, s = values.shape
    ends = jnp.cumsum(lengths, axis=-1, dtype=jnp.int32)
    total_bits = ends[:, -1]
    j = jnp.arange(max_bytes * 8, dtype=jnp.int32)
    owner = jax.vmap(lambda e: jnp.searchsorted(e, j, side="right"))(ends)
    owner_c = jnp.minimum(owner, s - 1).astype(jnp.int32)
    e = jnp.take_along_axis(ends, owner_c, axis=-1)
    v = jnp.take_along_axis(values, owner_c, axis=-1)
    shift = jnp.clip(e - 1 - j, 0, 31).astype(jnp.uint32)
    bit = (v >> shift) & jnp.uint32(1)
    bit = jnp.where(j < total_bits[:, None], bit, 0).astype(jnp.int32)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    packed = jnp.sum(bit.reshape(b, max_bytes, 8) * weights, axis=-1)
    return packed.astype(jnp.uint8), total_bits
