"""Variable blocking-strategy streams: emission (oracle extension) and
batched decode (grouped-by-block-size device path).

The reference can only *read* these streams, one frame at a time
(flac/decoder.py:133-185 header grammar, 231-257 sample numbering);
neither its encoder nor flacx's device encoder writes them.  Round 3
closes the last documented batch-path gap: decode_array now groups
variable-blocking frames by block size and runs each group through the
same fused device pipeline as fixed-blocking batches.
"""

import io

import numpy as np
import pytest

import flacx.decoder as dec
from flacx.decoder import _scan_frame_chain, decode_array, decode_stream
from flacx.oracle.encoder import EncoderParameters, encode_stream_variable


def _signal(total: int, channels: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(total)
    base = (6000 * np.sin(2 * np.pi * 220 * t / 44100)).astype(np.int64)
    pcm = np.stack([base + rng.integers(-400, 400, total)
                    for _ in range(channels)], axis=1)
    return np.clip(pcm, -(1 << 15), (1 << 15) - 1).astype(np.int64)


def _encode_variable(block_sizes, channels=2, seed=0):
    total = sum(block_sizes)
    pcm = _signal(total, channels, seed)
    params = EncoderParameters()
    pieces = list(encode_stream_variable(44100, 16, channels,
                                         pcm.tolist(), params, block_sizes))
    # frame byte offsets, for scan validation: pieces[0:3] are the header
    offsets, pos = [], sum(len(p) for p in pieces[:3])
    for p in pieces[3:]:
        offsets.append(pos)
        pos += len(p)
    return b"".join(pieces), pcm, np.asarray(offsets, np.int64)


# enough same-size frames to form device groups, plus odd sizes that
# exercise the uncommon 8-bit (200) and 16-bit (1000) header forms and
# the oracle small-group path
BLOCK_SIZES = [512] * 12 + [1000] + [256] * 10 + [200] + [512] * 4


def test_scan_chain_variable_blocking():
    data, _, want_offsets = _encode_variable(BLOCK_SIZES)
    from flacx.decoder import parse_stream_header
    _, first = parse_stream_header(data)
    offsets, bsizes, ambiguous = _scan_frame_chain(data, first)
    np.testing.assert_array_equal(offsets, want_offsets)
    np.testing.assert_array_equal(bsizes, np.asarray(BLOCK_SIZES))
    assert not ambiguous


def test_variable_blocking_batch_decode_bit_exact(monkeypatch):
    data, pcm, _ = _encode_variable(BLOCK_SIZES)

    # the batch path must handle this stream without the sequential
    # full-stream fallback (small groups still use the per-frame oracle)
    def no_sequential(*a, **k):
        raise AssertionError("sequential fallback taken")
    monkeypatch.setattr(dec, "_decode_sequential", no_sequential)

    streaminfo, got = decode_array(data)
    assert streaminfo.min_block_size != streaminfo.max_block_size
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_device_groups_only(monkeypatch):
    # every group is device-sized: the decode must succeed without ANY
    # per-frame oracle reads or the sequential fallback
    data, pcm, _ = _encode_variable([512] * 16 + [256] * 16, seed=11)

    def no_oracle(*a, **k):
        raise AssertionError("oracle frame decode taken")
    monkeypatch.setattr(dec, "read_frame", no_oracle)
    monkeypatch.setattr(dec, "_decode_sequential", no_oracle)

    _, got = decode_array(data)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_mono_and_no_verify():
    data, pcm, _ = _encode_variable([512] * 10 + [320], channels=1, seed=3)
    _, got = decode_array(data, verify_crc=False)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_sequential_matches():
    data, pcm, _ = _encode_variable(BLOCK_SIZES, seed=5)
    _, got = decode_array(data, device=False)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_stream_decode():
    data, pcm, _ = _encode_variable(BLOCK_SIZES, seed=7)
    _, chunks = decode_stream(io.BytesIO(data))
    got = np.concatenate(list(chunks), axis=0)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_stream_uses_batch_path(monkeypatch):
    # all-device-sized groups: the streaming decoder must take the grouped
    # batch path, leaving exactly one strict frame read (the EOF tail)
    data, pcm, _ = _encode_variable([512] * 16 + [256] * 16, seed=17)
    calls = []
    real = dec.read_frame

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dec, "read_frame", counting)
    _, chunks = decode_stream(io.BytesIO(data))
    got = np.concatenate(list(chunks), axis=0)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))
    assert len(calls) == 1


def test_variable_blocking_stream_small_windows():
    # a readahead far below the file size forces many refill windows, each
    # starting at the previous window's last scanned boundary
    data, pcm, _ = _encode_variable(BLOCK_SIZES, seed=19)
    _, chunks = decode_stream(io.BytesIO(data), readahead=4 << 10)
    got = np.concatenate(list(chunks), axis=0)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_sharded_decode():
    from flacx.parallel import data_mesh, frame_sharding
    data, pcm, _ = _encode_variable([512] * 16 + [256] * 16, seed=13)
    _, got = decode_array(data, batch_frames=8,
                          sharding=frame_sharding(data_mesh(8)))
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_variable_blocking_corrupt_falls_back_strict():
    data, pcm, offsets = _encode_variable(BLOCK_SIZES, seed=9)
    # corrupt one payload byte in a device-group frame: batch CRC-16
    # rejects it, and the strict paths must raise rather than emit PCM
    bad = bytearray(data)
    bad[offsets[3] + 9] ^= 0x40
    with pytest.raises(Exception):
        decode_array(bytes(bad))
