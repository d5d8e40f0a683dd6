"""The FLAC stream grammar as data (layer L3 of the reference).

Parity: reference flac/common.py.  Everything here is pure data — constants,
encoding tables, and frozen model records.  Tables that feed device kernels
are re-exported as numpy arrays so ``flacx.ops`` can lift them to JAX
constants without importing this module's enums into traced code.

Stream layout (RFC 9639):
    stream   := 'fLaC' metadata-block+ frame*
    frame    := header subframe{channels} padding crc16
    subframe := header (constant | verbatim | fixed | lpc)
    residual := coding-method partition-order rice-partition{2^order}
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

MAGIC = b"fLaC"

#: 15-bit frame sync code (0b111111111111100), reference flac/common.py:10.
FRAME_SYNC_CODE = 0x7FFC

#: CRC generator polynomials (with the leading x^n term), common.py:12-13.
CRC8_POLYNOMIAL = 0x107        # x^8 + x^2 + x + 1
CRC16_POLYNOMIAL = 0x18005     # x^16 + x^15 + x^2 + 1

#: Fixed (polynomial) predictor taps for orders 0..4, common.py:15-21.
FIXED_PREDICTOR_COEFFICIENTS: tuple[tuple[int, ...], ...] = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)

#: Same table, zero-padded to shape [5, 4] for device kernels (int32).
FIXED_PREDICTOR_TAPS = np.array(
    [list(c) + [0] * (4 - len(c)) for c in FIXED_PREDICTOR_COEFFICIENTS],
    dtype=np.int32,
)

MAX_LPC_ORDER = 32
MAX_FIXED_ORDER = 4
MAX_RICE_PARTITION_ORDER = 15
#: Largest Rice parameter expressible by the 5-bit coding method (31=escape).
MAX_RICE_PARAMETER = 30
#: Largest Rice parameter expressible by the 4-bit coding method (15=escape).
MAX_RICE_PARAMETER_4BIT = 14


# ---------------------------------------------------------------------------
# Metadata

class MetadataBlockType(enum.IntEnum):
    """Reference flac/common.py:26-33."""
    Streaminfo = 0
    Padding = 1
    Application = 2
    Seektable = 3
    VorbisComment = 4
    Cuesheet = 5
    Picture = 6


@dataclass(frozen=True)
class MetadataBlockHeader:
    last: bool
    type: MetadataBlockType
    length: int


@dataclass(frozen=True)
class Streaminfo:
    """Reference flac/common.py:45-55."""
    min_block_size: int
    max_block_size: int
    min_frame_size: int
    max_frame_size: int
    sample_rate: int
    channels: int
    sample_size: int
    samples: int
    md5: bytes


# ---------------------------------------------------------------------------
# Frame header fields

class BlockingStrategy(enum.IntEnum):
    Fixed = 0
    Variable = 1


#: 4-bit encodings for common block sizes, reference flac/common.py:85-105.
BLOCK_SIZE_ENCODING: dict[int, int] = {
    192: 0b0001,
    576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011,
    4096: 0b1100, 8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
BLOCK_SIZE_UNCOMMON8 = 0b0110   # followed by 8-bit (size - 1)
BLOCK_SIZE_UNCOMMON16 = 0b0111  # followed by 16-bit (size - 1)

#: 4-bit encodings for common sample rates (RFC 9639 table; NB the reference
#: maps 96 kHz to 0b1100 — a latent spec bug, flac/common.py:160 — which is
#: unreachable there because frame headers always use from-streaminfo).
SAMPLE_RATE_ENCODING: dict[int, int] = {
    88_200: 0b0001, 176_400: 0b0010, 192_000: 0b0011,
    8_000: 0b0100, 16_000: 0b0101, 22_050: 0b0110, 24_000: 0b0111,
    32_000: 0b1000, 44_100: 0b1001, 48_000: 0b1010, 96_000: 0b1011,
}
SAMPLE_RATE_FROM_STREAMINFO = 0b0000
SAMPLE_RATE_UNCOMMON8_KHZ = 0b1100   # + 8 bits, rate in kHz
SAMPLE_RATE_UNCOMMON16_HZ = 0b1101   # + 16 bits, rate in Hz
SAMPLE_RATE_UNCOMMON16_DAHZ = 0b1110  # + 16 bits, rate in tens of Hz
SAMPLE_RATE_DECODING = {v: k for k, v in SAMPLE_RATE_ENCODING.items()}

#: 3-bit encodings for common sample sizes, reference flac/common.py:249-256.
SAMPLE_SIZE_ENCODING: dict[int, int] = {
    8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111,
}
SAMPLE_SIZE_FROM_STREAMINFO = 0b000
SAMPLE_SIZE_DECODING = {v: k for k, v in SAMPLE_SIZE_ENCODING.items()}


class Channels(enum.IntEnum):
    """Channel layout / stereo decorrelation mode.

    The enum *value* is the 4-bit wire encoding (reference
    flac/common.py:199-211 CHANNELS_ENCODING).
    """
    M = 0b0000
    L_R = 0b0001
    L_R_C = 0b0010
    FL_FR_BL_BR = 0b0011
    FL_FR_FC_BL_BR = 0b0100
    FL_FR_FC_LFE_BL_BR = 0b0101
    FL_FR_FC_LFE_BC_SL_SR = 0b0110
    FL_FR_FC_LFE_BL_BR_SL_SR = 0b0111
    L_S = 0b1000   # left + side
    S_R = 0b1001   # side + right
    M_S = 0b1010   # mid + side

    @property
    def count(self) -> int:
        """Number of coded subframes.  Reference flac/common.py:215-227."""
        if self in (Channels.L_S, Channels.S_R, Channels.M_S):
            return 2
        return int(self) + 1

    @property
    def decorrelation_bit(self) -> list[int]:
        """Extra sample-size bit for the side channel per subframe index.

        Reference flac/common.py:186-196.
        """
        if self is Channels.L_S:
            return [0, 1]
        if self is Channels.S_R:
            return [1, 0]
        if self is Channels.M_S:
            return [0, 1]
        return [0] * self.count


#: Channel layout for a plain n-channel stream (no decorrelation).
INDEPENDENT_CHANNELS: dict[int, Channels] = {
    1: Channels.M, 2: Channels.L_R, 3: Channels.L_R_C,
    4: Channels.FL_FR_BL_BR, 5: Channels.FL_FR_FC_BL_BR,
    6: Channels.FL_FR_FC_LFE_BL_BR, 7: Channels.FL_FR_FC_LFE_BC_SL_SR,
    8: Channels.FL_FR_FC_LFE_BL_BR_SL_SR,
}


# ---------------------------------------------------------------------------
# Frame / subframe model records (used by the oracle codec and tests)

@dataclass(frozen=True)
class FrameHeader:
    """Reference flac/common.py:263-272."""
    blocking_strategy: BlockingStrategy
    block_size: int
    sample_rate: Optional[int]
    channels: Channels
    sample_size: Optional[int]
    coded_number: int
    crc: Optional[int] = None


class SubframeKind(enum.Enum):
    Constant = enum.auto()
    Verbatim = enum.auto()
    Fixed = enum.auto()
    LPC = enum.auto()


@dataclass(frozen=True)
class SubframeHeader:
    kind: SubframeKind
    order: int           # 0 for constant/verbatim
    wasted_bits: int


@dataclass(frozen=True)
class Subframe:
    """A decoded/encodable subframe in one record (vs the reference's four
    dataclasses, flac/common.py:314-364); unused fields stay at defaults."""
    kind: SubframeKind
    order: int = 0
    wasted_bits: int = 0
    constant: int = 0
    verbatim: tuple[int, ...] = ()
    warmup: tuple[int, ...] = ()
    precision: int = 0       # LPC only
    shift: int = 0           # LPC only
    coefficients: tuple[int, ...] = ()  # LPC only
    residual: tuple[int, ...] = ()      # signed residual (not zigzag)


class RiceCodingMethod(enum.IntEnum):
    """Value == parameter field width.  Reference flac/common.py:401-403."""
    Rice4Bit = 4
    Rice5Bit = 5


@dataclass(frozen=True)
class RicePartition:
    parameter: int                  # escape if parameter == (1<<width)-1
    escaped_size: int = 0           # bits per raw sample when escaped
    residual: tuple[int, ...] = ()  # signed residual values


@dataclass(frozen=True)
class Residual:
    coding_method: RiceCodingMethod
    partition_order: int
    partitions: tuple[RicePartition, ...]


@dataclass(frozen=True)
class Frame:
    header: FrameHeader
    subframes: tuple[Subframe, ...]
    crc: int = 0


# ---------------------------------------------------------------------------
# Header field encoders (shared by oracle encoder and device header builder)

def encode_block_size_bits(size: int) -> tuple[int, int, int]:
    """Return ``(code4, extra_bits, extra_value)`` for a block size.

    ``extra_bits`` is 0, 8 or 16 trailing bits carrying ``size - 1``.
    Reference flac/encoder.py:245-255 + 280-287.
    """
    code = BLOCK_SIZE_ENCODING.get(size)
    if code is not None:
        return code, 0, 0
    if 1 <= size <= 256:
        return BLOCK_SIZE_UNCOMMON8, 8, size - 1
    if size <= 65536:
        return BLOCK_SIZE_UNCOMMON16, 16, size - 1
    raise ValueError(f"cannot encode block size {size}")


def encode_sample_rate_bits(sample_rate: Optional[int]) -> tuple[int, int, int]:
    """Return ``(code4, extra_bits, extra_value)`` for the sample-rate field.

    ``None`` means "read from streaminfo" (the reference encoder always uses
    this, flac/encoder.py:94).  Reference flac/encoder.py:258-271 + 290-301.
    """
    if sample_rate is None:
        return SAMPLE_RATE_FROM_STREAMINFO, 0, 0
    code = SAMPLE_RATE_ENCODING.get(sample_rate)
    if code is not None:
        return code, 0, 0
    if sample_rate < 65536:
        return SAMPLE_RATE_UNCOMMON16_HZ, 16, sample_rate
    if sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
        return SAMPLE_RATE_UNCOMMON8_KHZ, 8, sample_rate // 1000
    if sample_rate % 10 == 0 and sample_rate // 10 < 65536:
        return SAMPLE_RATE_UNCOMMON16_DAHZ, 16, sample_rate // 10
    raise ValueError(f"cannot encode sample rate {sample_rate}")


def encode_sample_size_bits(size: Optional[int]) -> int:
    """3-bit sample-size field; ``None`` = from streaminfo.

    Reference flac/encoder.py:274-277 + 308-313.
    """
    if size is None:
        return SAMPLE_SIZE_FROM_STREAMINFO
    code = SAMPLE_SIZE_ENCODING.get(size)
    if code is None:
        raise ValueError(f"cannot encode sample size {size}")
    return code
