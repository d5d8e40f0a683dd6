"""Native host-runtime library vs numpy fallbacks."""

import numpy as np
import pytest

from flacx import native
from flacx.crc import crc16


@pytest.fixture(scope="module")
def cdll():
    lib = native.lib()
    if lib is None:
        pytest.skip("no C++ toolchain / native build unavailable")
    return lib


def test_assemble_frames(cdll, rng):
    data = rng.integers(0, 256, size=(7, 64)).astype(np.uint8)
    lens = rng.integers(0, 65, size=7).astype(np.int32)
    got = native.assemble_frames(data, lens)
    want = [data[i, : lens[i]].tobytes() for i in range(7)]
    assert got == want
    assert native.assemble_stream(data, lens) == b"".join(want)


def test_crc16_rows(cdll, rng):
    data = rng.integers(0, 256, size=(5, 96)).astype(np.uint8)
    lens = rng.integers(1, 97, size=5).astype(np.int32)
    got = native.crc16_rows(data, lens)
    for i in range(5):
        assert got[i] == crc16(bytes(data[i, : lens[i]]))


def test_pack24(cdll, rng):
    samples = rng.integers(-(1 << 23), 1 << 23, size=256).astype(np.int32)
    got = native.pack24(samples)
    from flacx.wavio import pcm_to_le_bytes
    want = pcm_to_le_bytes(samples.reshape(-1, 1), 24)
    assert got == want


def test_fallback_paths(rng, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    data = rng.integers(0, 256, size=(3, 32)).astype(np.uint8)
    lens = np.array([5, 0, 32], np.int32)
    assert native.assemble_frames(data, lens) == [
        data[i, : lens[i]].tobytes() for i in range(3)]
    got = native.crc16_rows(data, lens)
    assert got[2] == crc16(bytes(data[2]))
