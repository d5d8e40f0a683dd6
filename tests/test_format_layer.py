"""Format tables, CRC, coded numbers."""

import numpy as np
import pytest

import flacx.coded_number as cn
from flacx import format as fmt
from flacx.crc import crc8, crc16, crc16_batch
from flacx.utils import (argparse_range, batch, group, log2i, zigzag_decode,
                         zigzag_encode)


# -- coded numbers ----------------------------------------------------------

@pytest.mark.parametrize("value", [0, 1, 0x41, 127, 128, 0x7FF, 0x800,
                                   0xFFFF, 0x10000, (1 << 21) - 1, 1 << 21,
                                   (1 << 26) - 1, 1 << 26, (1 << 31) - 1,
                                   1 << 31, (1 << 36) - 1])
def test_coded_number_roundtrip(value):
    bs = cn.encode(value)
    assert cn.following_bytes(bs[0]) == len(bs) - 1
    assert cn.decode(bs) == value


def test_coded_number_vectors():
    # reference test_coded_number.py vectors: 1- and 2-byte forms
    assert cn.encode(0x00) == b"\x00"
    assert cn.encode(0x7F) == b"\x7f"
    assert cn.encode(0x80) == b"\xc2\x80"
    assert cn.encode(0x41) == b"A"


def test_coded_number_rejects():
    with pytest.raises(ValueError):
        cn.encode(1 << 36)
    with pytest.raises(ValueError):
        cn.decode(b"\xc2")  # truncated


# -- CRC --------------------------------------------------------------------

def test_crc8_vectors():
    # CRC-8 (poly 0x07, init 0) check value over '123456789'
    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0
    assert crc8(b"\xff\xf8") == crc8(b"\xff\xf8")


def test_crc16_vectors():
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check value
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0


def test_crc16_batch_matches_scalar(rng):
    b, l = 16, 64
    data = rng.integers(0, 256, size=(b, l)).astype(np.uint8)
    lengths = rng.integers(0, l + 1, size=b)
    got = crc16_batch(data, lengths)
    for i in range(b):
        assert got[i] == crc16(bytes(data[i, : lengths[i]]))


# -- header field encoders --------------------------------------------------

def test_block_size_bits():
    assert fmt.encode_block_size_bits(4608) == (0b0101, 0, 0)
    assert fmt.encode_block_size_bits(192) == (0b0001, 0, 0)
    assert fmt.encode_block_size_bits(16384) == (0b1110, 0, 0)
    code, extra, val = fmt.encode_block_size_bits(100)
    assert (code, extra, val) == (0b0110, 8, 99)
    code, extra, val = fmt.encode_block_size_bits(5000)
    assert (code, extra, val) == (0b0111, 16, 4999)


def test_sample_rate_bits():
    assert fmt.encode_sample_rate_bits(None) == (0b0000, 0, 0)
    assert fmt.encode_sample_rate_bits(44100) == (0b1001, 0, 0)
    assert fmt.encode_sample_rate_bits(96000) == (0b1011, 0, 0)
    code, extra, val = fmt.encode_sample_rate_bits(12345)
    assert (code, extra, val) == (0b1101, 16, 12345)


def test_channels_model():
    assert fmt.Channels.L_R.count == 2
    assert fmt.Channels.M.count == 1
    assert fmt.Channels.FL_FR_FC_LFE_BL_BR_SL_SR.count == 8
    assert fmt.Channels.L_S.decorrelation_bit == [0, 1]
    assert fmt.Channels.S_R.decorrelation_bit == [1, 0]
    assert fmt.Channels.M_S.decorrelation_bit == [0, 1]
    assert fmt.Channels.L_R.decorrelation_bit == [0, 0]


def test_fixed_taps_table():
    assert fmt.FIXED_PREDICTOR_TAPS.shape == (5, 4)
    assert list(fmt.FIXED_PREDICTOR_TAPS[2]) == [2, -1, 0, 0]
    assert list(fmt.FIXED_PREDICTOR_TAPS[4]) == [4, -6, 4, -1]


# -- utils ------------------------------------------------------------------

def test_utils():
    assert argparse_range("5") == range(0, 6)
    assert argparse_range("2,5") == range(2, 6)
    assert [x for x in batch(iter("ABCDE"), 2)] == [["A", "B"], ["C", "D"], ["E"]]
    assert group([1, 2, 3, 4], 2) == [[1, 2], [3, 4]]
    assert log2i(4608) == 12
    for v in range(-100, 100):
        assert zigzag_decode(zigzag_encode(v)) == v
    assert zigzag_encode(-1) == 1 and zigzag_encode(1) == 2
