"""Table-free CRC-8/CRC-16 on device via GF(2) polynomial folding.

CRC over GF(2) is linear:  ``crc(m) = Σ_i clmul(byte_i, x^(8·d_i + w)) mod P``
where ``d_i`` is the byte's distance from the end of the message and ``w``
the CRC width.  The per-distance constants ``x^(8d+w) mod P`` are a small
precomputed table; the carry-less multiply of an 8-bit byte by a ≤16-bit
constant unrolls into 8 conditional XORs — all vectorised over
``batch × position``, replacing the reference's byte-serial table walk
(flac/crc.py:18-31) with O(log) reduction depth.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flacx.format import CRC8_POLYNOMIAL, CRC16_POLYNOMIAL


def _gf_mod(value: int, width: int, poly_with_top: int) -> int:
    for t in range(value.bit_length() - 1, width - 1, -1):
        if (value >> t) & 1:
            value ^= poly_with_top << (t - width)
    return value


@lru_cache(maxsize=None)
def power_table(width: int, poly_with_top: int, max_len: int) -> np.ndarray:
    """``tab[d] = x^(8d + width) mod P`` for byte distances ``0..max_len-1``."""
    out = np.zeros(max_len, np.uint32)
    r = _gf_mod(1 << width, width, poly_with_top)  # x^width mod P
    for d in range(max_len):
        out[d] = r
        r = _gf_mod(r << 8, width, poly_with_top)
    return out


def _xor_reduce(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce(x, jnp.uint32(0), jax.lax.bitwise_xor, (x.ndim - 1,))


def crc_fold(byte_vals: jnp.ndarray, distances: jnp.ndarray,
             active: jnp.ndarray, width: int,
             poly_with_top: int) -> jnp.ndarray:
    """CRC of the byte sequence described positionally.

    Args:
      byte_vals: ``[..., L]`` uint32 byte values (0..255).
      distances: ``[..., L]`` int32 distance from the message END in bytes
        (last byte has distance 0); entries with ``active=False`` ignored.
      active: ``[..., L]`` bool.
    Returns:
      ``[...]`` uint32 CRC (width bits).
    """
    max_len = byte_vals.shape[-1] + 1
    tab = jnp.asarray(power_table(width, poly_with_top, max_len))
    k = tab[jnp.clip(distances, 0, max_len - 1)]
    b = byte_vals.astype(jnp.uint32)

    prod = jnp.zeros_like(k)
    for t in range(8):
        bit = (b >> t) & jnp.uint32(1)
        prod = prod ^ ((k << t) * bit)
    prod = jnp.where(active, prod, jnp.uint32(0))

    total = _xor_reduce(prod)
    # Reduce the ≤ width+7 bit accumulator mod P.
    for t in range(width + 6, width - 1, -1):
        bit = (total >> t) & jnp.uint32(1)
        total = total ^ (jnp.uint32(poly_with_top << (t - width)) * bit)
    return total


def crc16_over_rows(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """CRC-16 of ``data[b, :lengths[b]]`` per row; ``data`` is ``[..., L]`` u8."""
    l = data.shape[-1]
    pos = jnp.arange(l, dtype=jnp.int32)
    dist = lengths[..., None] - 1 - pos
    return crc_fold(data.astype(jnp.uint32), dist, dist >= 0,
                    16, CRC16_POLYNOMIAL)


def crc8_fold(byte_vals: jnp.ndarray, distances: jnp.ndarray,
              active: jnp.ndarray) -> jnp.ndarray:
    return crc_fold(byte_vals, distances, active, 8, CRC8_POLYNOMIAL)
