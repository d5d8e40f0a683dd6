"""Frame header construction on device.

The FLAC frame header is byte-aligned throughout (sync + flags are exactly
4 bytes, then whole-byte coded-number / uncommon-size / CRC-8 fields), so it
is built here as byte *symbols* for the bit packer — with per-symbol
distances-from-end so the trailing CRC-8 can be folded without first
compacting the variable-length layout.

Parity: reference flac/encoder.py:194-234 (put_frame_header).  Sample rate
and sample size always use the from-streaminfo encoding, like the reference
(flac/encoder.py:94-97); the channel field is dynamic (stereo decorrelation
mode is chosen per frame — a capability the reference encoder lacks,
README.md:128).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from flacx.format import (SAMPLE_RATE_FROM_STREAMINFO,
                          SAMPLE_SIZE_FROM_STREAMINFO,
                          encode_block_size_bits)
from flacx.ops.crcfold import crc8_fold

#: coded-number size thresholds: value >= 2^cap ⇒ one more byte
_CN_THRESHOLDS = (7, 11, 16, 21, 26, 31)
#: prefix byte leading-ones pattern per total size 1..7
_CN_PREFIX = np.array([0x00, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE], np.uint32)


class HeaderSymbols(NamedTuple):
    values: jnp.ndarray    # [B, H] uint32
    lengths: jnp.ndarray   # [B, H] int32
    nbytes: jnp.ndarray    # [B] header length in bytes (incl. CRC-8)


def frame_header_symbols(frame_index: jnp.ndarray, ch_code: jnp.ndarray,
                         block_size: int) -> HeaderSymbols:
    """Build header byte-symbols for a batch of frames.

    Args:
      frame_index: ``[B]`` int64 frame ordinals (fixed blocking strategy).
      ch_code: ``[B]`` int32 4-bit channel-assignment codes.
      block_size: static block size (full blocks only; the short final
        block of a stream is encoded host-side).
    """
    b = frame_index.shape[0]
    idx = frame_index.astype(jnp.int64)

    bs_code, bs_extra_bits, bs_extra = encode_block_size_bits(block_size)
    sr_code = SAMPLE_RATE_FROM_STREAMINFO
    ss_code = SAMPLE_SIZE_FROM_STREAMINFO

    # Coded-number size: 1 + #thresholds exceeded.
    size = jnp.full((b,), 1, jnp.int32)
    for cap in _CN_THRESHOLDS:
        size = size + (idx >= (1 << cap)).astype(jnp.int32)

    # Fixed four bytes: sync(15) + blocking(1) = FF F8, then packed codes.
    b0 = jnp.full((b,), 0xFF, jnp.uint32)
    b1 = jnp.full((b,), 0xF8, jnp.uint32)
    b2 = jnp.full((b,), (bs_code << 4) | sr_code, jnp.uint32)
    b3 = (ch_code.astype(jnp.uint32) << 4) | (ss_code << 1)

    # Coded-number byte slots 0..6.
    prefix = jnp.asarray(_CN_PREFIX)[size - 1]
    top = (idx >> (6 * (size - 1).astype(jnp.int64))).astype(jnp.uint32)
    cn0 = jnp.where(size == 1, idx.astype(jnp.uint32), prefix | top)
    cn_vals, cn_lens = [cn0], [jnp.full((b,), 8, jnp.int32)]
    for t in range(1, 7):
        sh = 6 * (size - 1 - t)
        payload = (idx >> jnp.maximum(sh, 0).astype(jnp.int64)) & 0x3F
        cn_vals.append((0x80 | payload).astype(jnp.uint32))
        cn_lens.append(jnp.where(t < size, 8, 0).astype(jnp.int32))

    # Static uncommon-block-size extra bytes (0, 1 or 2 of them).
    extra_vals, extra_lens = [], []
    n_extra = bs_extra_bits // 8
    if n_extra >= 1:
        for byte_i in range(n_extra):
            v = (bs_extra >> (8 * (n_extra - 1 - byte_i))) & 0xFF
            extra_vals.append(jnp.full((b,), v, jnp.uint32))
            extra_lens.append(jnp.full((b,), 8, jnp.int32))

    vals = [b0, b1, b2, b3, *cn_vals, *extra_vals]
    lens = [jnp.full((b,), 8, jnp.int32)] * 4 + cn_lens + extra_lens
    values = jnp.stack(vals, axis=-1)
    lengths = jnp.stack(lens, axis=-1)

    # CRC-8 over all active bytes: logical position of slot h is
    # 4 fixed + its offset among active coded-number/extra slots.
    h = values.shape[-1]
    slot = jnp.arange(h, dtype=jnp.int32)
    active = lengths > 0
    # positions: fixed slots at 0..3; cn slot t at 4+t; extra slot e at 4+size+e
    pos = jnp.where(slot < 4, slot, 0)
    pos = jnp.where((slot >= 4) & (slot < 11), slot, pos)  # cn slots
    if n_extra:
        pos = jnp.where(slot >= 11, 4 + size[:, None] + (slot - 11), pos)
    total_precrc = 4 + size + n_extra
    dist = total_precrc[:, None] - 1 - pos
    crc = crc8_fold(values, dist, active)

    values = jnp.concatenate([values, crc[:, None]], axis=-1)
    lengths = jnp.concatenate(
        [lengths, jnp.full((b, 1), 8, jnp.int32)], axis=-1)
    return HeaderSymbols(values=values, lengths=lengths,
                         nbytes=total_precrc + 1)
