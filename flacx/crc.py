"""CRC-8 / CRC-16 over GF(2) (host side, numpy).

Parity: reference flac/crc.py (table-driven, byte-serial).  Here the tables
are built with numpy and there are *batched* entry points that advance many
independent CRC states in lock-step — the shape the device folding kernel
(``flacx.ops.crcdev``) is verified against.

FLAC uses CRC-8 (poly 0x107) over the frame header and CRC-16 (poly 0x18005)
over the whole frame, both with initial value 0 and no reflection.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from flacx.format import CRC8_POLYNOMIAL, CRC16_POLYNOMIAL


@lru_cache(maxsize=None)
def crc_table(width: int, poly_with_top: int) -> np.ndarray:
    """256-entry CRC lookup table for a ``width``-bit CRC.

    ``poly_with_top`` includes the leading x^width term (e.g. 0x107, 0x18005).
    Parity: reference flac/crc.py:4-15.
    """
    poly = poly_with_top & ((1 << width) - 1)
    top = 1 << (width - 1)
    entries = np.arange(256, dtype=np.uint32) << (width - 8)
    for _ in range(8):
        hit = (entries & top) != 0
        entries = ((entries << 1) ^ np.where(hit, poly, 0)) & ((1 << width) - 1)
    return entries.astype(np.uint32)


def crc8(data: bytes, initial: int = 0) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1.  Parity: flac/crc.py:18-23."""
    table = crc_table(8, CRC8_POLYNOMIAL)
    crc = initial
    for b in data:
        crc = int(table[b ^ crc])
    return crc

def crc16(data: bytes, initial: int = 0) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1.  Parity: flac/crc.py:26-31."""
    table = crc_table(16, CRC16_POLYNOMIAL)
    crc = initial
    for b in data:
        crc = int(table[(crc >> 8) ^ b]) ^ ((crc << 8) & 0xFFFF)
    return crc


def crc16_batch(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """CRC-16 of ``data[i, :lengths[i]]`` for every row, vectorised over rows.

    ``data`` is uint8 ``[B, L]``.  Iterates over the byte axis only; all rows
    advance together.  Bytes past ``lengths`` must not affect the result, so
    each row's state freezes once its length is exhausted.
    """
    table = crc_table(16, CRC16_POLYNOMIAL)
    b, l = data.shape
    crc = np.zeros(b, dtype=np.uint32)
    for j in range(l):
        active = j < lengths
        nxt = table[(crc >> 8) ^ data[:, j]] ^ ((crc << 8) & 0xFFFF)
        crc = np.where(active, nxt, crc)
    return crc.astype(np.uint16)
