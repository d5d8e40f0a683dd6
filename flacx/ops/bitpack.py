"""Prefix-sum bit packer: variable-length symbol streams → packed bytes.

Replaces the reference's one-call-per-bit ``Put.uint`` funnel
(flac/binary.py:168-206, the #1 hot spot per SURVEY.md §3.4) with a fully
parallel formulation:

  symbol lengths → exclusive prefix sum → every *output bit* locates its
  owning symbol by binary search over the symbol end offsets and extracts
  its bit — embarrassingly parallel over ``batch × bits``.

Symbols are ``(value: u32, length: i32)`` pairs.  A symbol's value occupies
the LOW ``min(length, 32)`` bits of its span; bits above that are zero, which
encodes arbitrary-length zero runs (Rice unary quotients) as single symbols.
Zero-length symbols are free placeholders, letting callers use fixed slot
layouts with masked/absent fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BYTE_WEIGHTS = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)


def pack_symbols(values: jnp.ndarray, lengths: jnp.ndarray,
                 max_bytes: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack per-row symbol streams into byte arrays.

    Args:
      values: ``[B, S]`` uint32 symbol payloads (low bits).
      lengths: ``[B, S]`` int32 bit lengths (0 = absent symbol).
      max_bytes: static output capacity per row.
    Returns:
      ``(bytes u8 [B, max_bytes], total_bits i32 [B])``; bytes beyond each
      row's stream are zero.
    """
    b, s = values.shape
    ends = jnp.cumsum(lengths, axis=-1, dtype=jnp.int32)  # [B, S]
    total_bits = ends[:, -1]

    j = jnp.arange(max_bytes * 8, dtype=jnp.int32)

    # Owner of bit j = first symbol whose end offset exceeds j (zero-length
    # symbols produce duplicate ends; side='right' skips them).
    owner = jax.vmap(
        lambda e: jnp.searchsorted(e, j, side="right"))(ends)
    owner_c = jnp.minimum(owner, s - 1).astype(jnp.int32)

    e = jnp.take_along_axis(ends, owner_c, axis=-1)
    v = jnp.take_along_axis(values, owner_c, axis=-1)

    shift = jnp.clip(e - 1 - j, 0, 31).astype(jnp.uint32)
    bit = (v >> shift) & jnp.uint32(1)
    bit = jnp.where(j < total_bits[:, None], bit, 0).astype(jnp.int32)

    packed = jnp.sum(bit.reshape(b, max_bytes, 8) * _BYTE_WEIGHTS, axis=-1)
    return packed.astype(jnp.uint8), total_bits
