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
    """XOR-reduce the last axis via a log-depth pairwise tree."""
    n = x.shape[-1]
    while n > 1:
        if n % 2:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
            x = jnp.pad(x, pad)
            n += 1
        x = x[..., : n // 2] ^ x[..., n // 2:]
        n //= 2
    return x[..., 0]


def _clmul16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Carry-less multiply of two ≤16-bit values (≤ 31-bit product)."""
    prod = jnp.zeros_like(a)
    for t in range(16):
        prod = prod ^ ((a << t) * ((b >> t) & jnp.uint32(1)))
    return prod


def _barrett(x: jnp.ndarray, width: int, poly_with_top: int,
             in_bits: int) -> jnp.ndarray:
    for t in range(in_bits - 1, width - 1, -1):
        bit = (x >> t) & jnp.uint32(1)
        x = x ^ (jnp.uint32(poly_with_top << (t - width)) * bit)
    return x


def _gf_mul(a: int, b: int, width: int, poly_with_top: int) -> int:
    """Carry-less multiply mod P (host helper)."""
    res = 0
    while b:
        if b & 1:
            res ^= a
        b >>= 1
        a = _gf_mod(a << 1, width, poly_with_top)
    return res


@lru_cache(maxsize=None)
def inverse_power_table(width: int, poly_with_top: int,
                        max_len: int) -> np.ndarray:
    """``tab[p] = x^(-8p) mod P`` for zero-pad lengths ``0..max_len-1``.

    ``x`` is a unit mod P because FLAC's CRC polynomials have a constant
    term; its multiplicative order ``ord`` is found by iteration, then
    ``x^(-8) = x^(ord-8)`` and the table is built by repeated modular
    multiplication.
    """
    acc, order = _gf_mod(1 << 1, width, poly_with_top), 1
    while acc != 1:
        acc = _gf_mod(acc << 1, width, poly_with_top)
        order += 1
    # c = x^(order-8) = x^{-8}
    c, e, base = 1, (order - 8) % order, 2
    while e:
        if e & 1:
            c = _gf_mul(c, base, width, poly_with_top)
        base = _gf_mul(base, base, width, poly_with_top)
        e >>= 1
    out = np.zeros(max_len, np.uint32)
    v = 1
    for p in range(max_len):
        out[p] = v
        v = _gf_mul(v, c, width, poly_with_top)
    return out


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
    """CRC-16 of ``data[b, :lengths[b]]`` per row; ``data`` is ``[..., L]`` u8.

    Bytes past ``lengths`` must already be zero (the bit packer guarantees
    this).  The fold then uses FIXED per-position constants — a compile-time
    vector, no gathers — because trailing zeros only multiply the true CRC
    by ``x^(8·pad)``, which one per-row inverse-power lookup undoes.
    """
    l = data.shape[-1]
    tab = power_table(16, CRC16_POLYNOMIAL, l + 1)
    k = jnp.asarray(tab[l - 1::-1].copy())          # fixed distance L-1-i
    b = data.astype(jnp.uint32)

    prod = jnp.zeros_like(b)
    for t in range(8):
        bit = (b >> t) & jnp.uint32(1)
        prod = prod ^ ((k << t) * bit)
    folded = _barrett(_xor_reduce(prod), 16, CRC16_POLYNOMIAL, 23)

    inv = jnp.asarray(inverse_power_table(16, CRC16_POLYNOMIAL, l + 1))
    fix = inv[jnp.clip(l - lengths, 0, l)]
    return _barrett(_clmul16(folded, fix), 16, CRC16_POLYNOMIAL, 31)


def crc8_fold(byte_vals: jnp.ndarray, distances: jnp.ndarray,
              active: jnp.ndarray) -> jnp.ndarray:
    return crc_fold(byte_vals, distances, active, 8, CRC8_POLYNOMIAL)


def crc16_over_word_rows(words: jnp.ndarray,
                         lengths: jnp.ndarray) -> jnp.ndarray:
    """CRC-16 of the big-endian byte stream of ``words[b, :]`` rows.

    Identical to ``crc16_over_rows`` on the byte expansion of ``words``
    (MSB-first u32, bytes past ``lengths[b]`` zero — the bit packer
    guarantees this), but folds 4 byte positions per 32-bit element, so
    the streamed array is a quarter the size.  Lets the encoder compute
    the frame CRC straight from the packed words, before (and fused
    with) the byte split.
    """
    w_count = words.shape[-1]
    l = w_count * 4
    tab = power_table(16, CRC16_POLYNOMIAL, l + 1)
    k4 = jnp.asarray(tab[l - 1::-1].copy().reshape(w_count, 4))
    d = words.astype(jnp.uint32)

    prod = jnp.zeros_like(d)
    for j in range(4):
        kj = k4[:, j]
        for t in range(8):
            bit = (d >> (8 * (3 - j) + t)) & jnp.uint32(1)
            prod = prod ^ ((kj << t) * bit)
    folded = _barrett(_xor_reduce(prod), 16, CRC16_POLYNOMIAL, 23)

    inv = jnp.asarray(inverse_power_table(16, CRC16_POLYNOMIAL, l + 1))
    fix = inv[jnp.clip(l - lengths, 0, l)]
    return _barrett(_clmul16(folded, fix), 16, CRC16_POLYNOMIAL, 31)
