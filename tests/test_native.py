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


def test_scatter_rows(cdll, rng):
    data = rng.integers(0, 256, size=1024).astype(np.uint8)
    offs = np.sort(rng.choice(900, size=9, replace=False)).astype(np.int64)
    ends = offs + rng.integers(0, 100, size=9)
    got = native.scatter_rows(data, offs, ends, 128)
    want = np.zeros((9, 128), np.uint8)
    for i, (o, e) in enumerate(zip(offs, ends)):
        want[i, : e - o] = data[o:e]
    np.testing.assert_array_equal(got, want)


def test_scan_candidates_matches_numpy(cdll, rng):
    """Native candidate scan == the numpy lock-step scan on real streams
    and on adversarial noise containing fake syncs."""
    import flacx.decoder as dec
    import flacx.native as nat

    # a real flacx stream (many true candidates)
    from conftest import make_pcm
    from tests.test_fuzz import CONFIG_POOL, _encode
    from flacx.encoder import BatchEncoder, EncoderConfig
    cfg = EncoderConfig(**CONFIG_POOL[0])
    enc = BatchEncoder(cfg, batch_frames=8)
    pcm = make_pcm(rng, 4 * cfg.block_size, 2, cfg.bps, "tonal")
    stream = np.frombuffer(_encode(cfg, enc, pcm), np.uint8)

    # noise heavy in 0xFF/0xF8 pairs (fake syncs, clamped-end reads)
    noise = rng.integers(0, 256, size=4096).astype(np.uint8)
    noise[rng.integers(0, 4000, size=600)] = 0xFF
    noise[rng.integers(1, 4001, size=300)] = 0xF8

    for arr, first in ((stream, 4), (noise, 0),
                       (noise[:7], 0), (noise[:1], 0)):
        native_out = nat.scan_candidates(arr, first)
        assert native_out is not None
        numpy_out = dec._scan_candidates.__wrapped__(arr, first) \
            if hasattr(dec._scan_candidates, "__wrapped__") else None
        if numpy_out is None:
            # call the numpy body by suppressing the native fast path
            import unittest.mock as mock
            with mock.patch.object(nat, "scan_candidates",
                                   lambda *a: None):
                numpy_out = dec._scan_candidates(arr, first)
        for a, b in zip(native_out, numpy_out):
            np.testing.assert_array_equal(a, b)
