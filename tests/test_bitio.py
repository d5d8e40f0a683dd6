"""Bit I/O spec tests.

Mirrors the reference's unit vectors (test/test_binary.py: cross-boundary
reads of the fLaC magic, 1..25-bit widths, negative-shift regressions) plus
round-trip property tests.
"""

import numpy as np
import pytest

from flacx.bitio import BitReader, BitWriter, mask


MAGIC_BITS = 0b01100110_01001100_01100001_01000011  # 'fLaC'


def test_mask():
    assert [mask(i) for i in range(4)] == [0, 1, 3, 7]


def test_reader_magic_whole():
    r = BitReader(b"fLaC")
    assert r.read_uint(32) == MAGIC_BITS


@pytest.mark.parametrize("widths", [
    [8, 8, 8, 8],
    [1, 7, 2, 6, 3, 5, 8],
    [4, 4, 4, 4, 4, 4, 4, 4],
    [25, 7],
    [1] * 32,
    [13, 19],
    [3, 29],
])
def test_reader_magic_split(widths):
    assert sum(widths) == 32
    r = BitReader(b"fLaC")
    acc = 0
    for w in widths:
        acc = (acc << w) | r.read_uint(w)
    assert acc == MAGIC_BITS


def test_reader_sint():
    w = BitWriter()
    for v, n in [(-1, 5), (15, 5), (-16, 5), (-123456, 20), (0, 3)]:
        w.write_sint(v, n)
    w.pad_to_byte()
    r = BitReader(w.getvalue())
    assert r.read_sint(5) == -1
    assert r.read_sint(5) == 15
    assert r.read_sint(5) == -16
    assert r.read_sint(20) == -123456
    assert r.read_sint(3) == 0


def test_writer_aligned_bytes():
    w = BitWriter()
    w.write_uint(0xAB, 8)
    w.write_bytes(b"\x01\x02")
    assert w.getvalue() == b"\xab\x01\x02"


def test_writer_cross_boundary():
    w = BitWriter()
    w.write_uint(0b101, 3)        # 101.....
    w.write_uint(0b11001, 5)      # 10111001
    w.write_uint(0x1F2F3, 20)     # + 20 bits
    w.write_uint(0, 4)
    b = w.getvalue()
    r = BitReader(b)
    assert r.read_uint(3) == 0b101
    assert r.read_uint(5) == 0b11001
    assert r.read_uint(20) == 0x1F2F3
    assert r.read_uint(4) == 0


def test_writer_negative_masking():
    # regression class from reference test_binary.py:119-141: values with more
    # significant bits than the field must be masked, incl. negatives
    w = BitWriter()
    w.write_uint(-1, 4)
    w.write_uint(0x1FF, 4)
    assert w.getvalue() == b"\xff"


def test_unary_roundtrip():
    qs = [0, 1, 2, 7, 8, 9, 63, 64, 65, 200, 1000]
    w = BitWriter()
    for q in qs:
        w.write_unary(q)
    w.pad_to_byte()
    r = BitReader(w.getvalue())
    for q in qs:
        assert r.read_unary() == q


def test_random_roundtrip():
    rng = np.random.default_rng(7)
    ops = []
    w = BitWriter()
    for _ in range(5000):
        n = int(rng.integers(1, 57))
        v = int(rng.integers(0, 1 << n))
        ops.append((v, n))
        w.write_uint(v, n)
    w.pad_to_byte()
    pad = (-sum(n for _, n in ops)) % 8
    r = BitReader(w.getvalue())
    for v, n in ops:
        assert r.read_uint(n) == v
    assert r.read_uint(pad) == 0
    assert r.at_eof()


def test_reader_eof():
    r = BitReader(b"\xff")
    r.read_uint(8)
    with pytest.raises(EOFError):
        r.read_uint(1)


def test_bit_position_tracking():
    r = BitReader(b"\xf0\x0f")
    assert r.bit_position == 0
    r.read_uint(3)
    assert r.bit_position == 3
    assert r.bits_until_alignment == 5
    r.read_uint(5)
    assert r.is_aligned
