"""Batched decoder: boundary scan, lockstep parse, device reconstruction."""

import io

import numpy as np
import pytest

from flacx.decoder import decode_array, scan_frame_offsets, parse_stream_header
from flacx.oracle import EncoderParameters, encode_stream

from conftest import make_pcm


def encode_bytes(pcm, sample_rate=44100, bps=16, **kwargs) -> bytes:
    frames, channels = pcm.shape
    params = EncoderParameters(**kwargs)
    rows = (list(map(int, pcm[i])) for i in range(frames))
    return b"".join(encode_stream(sample_rate, bps, channels, frames,
                                  rows, params))


@pytest.mark.parametrize("kind", ["tonal", "noise", "impulse", "silence"])
def test_batched_decode_roundtrip(rng, kind):
    pcm = make_pcm(rng, 512 * 5, 2, 16, kind)
    data = encode_bytes(pcm, block_size=512)
    si, got = decode_array(data, batch_frames=3)
    np.testing.assert_array_equal(got, pcm)


def test_batched_decode_partial_tail(rng):
    pcm = make_pcm(rng, 512 * 3 + 173, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=512)
    si, got = decode_array(data, batch_frames=2)
    np.testing.assert_array_equal(got, pcm)


def test_batched_decode_mono(rng):
    pcm = make_pcm(rng, 512 * 4, 1, 16, "tonal")
    data = encode_bytes(pcm, block_size=512)
    si, got = decode_array(data)
    np.testing.assert_array_equal(got, pcm)


def test_batched_decode_24bit(rng):
    pcm = make_pcm(rng, 512 * 3, 2, 24, "tonal")
    data = encode_bytes(pcm, sample_rate=96000, bps=24, block_size=512,
                        lpc_order=range(0, 17))
    si, got = decode_array(data)
    np.testing.assert_array_equal(got, pcm)


def test_frame_offset_scan(rng):
    pcm = make_pcm(rng, 512 * 4, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=512)
    si, first = parse_stream_header(data)
    offsets = scan_frame_offsets(data, first)
    assert len(offsets) == 4
    assert offsets[0] == first
    arr = np.frombuffer(data, np.uint8)
    assert (arr[offsets] == 0xFF).all()


def test_batched_decode_device_stream(rng):
    # decode frames produced by the DEVICE encoder
    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    n = 256
    pcm = make_pcm(rng, n * 4, 2, 16, "tonal")
    cfg = EncoderConfig(block_size=n, max_lpc_order=6,
                        partition_orders=(0, 1, 2))
    enc = BatchEncoder(cfg, batch_frames=2)
    planar = pcm.reshape(4, n, 2).transpose(0, 2, 1).astype(np.int32)
    frames = enc.encode_frames(planar, 0)
    stream = (MAGIC
              + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                          34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                4 * n, bytes(16)))
              + b"".join(frames))
    si, got = decode_array(stream, batch_frames=4)
    np.testing.assert_array_equal(got, pcm)


def test_corruption_detected(rng):
    pcm = make_pcm(rng, 512 * 3, 2, 16, "tonal")
    data = bytearray(encode_bytes(pcm, block_size=512))
    data[len(data) // 2] ^= 0x10
    with pytest.raises(Exception):
        decode_array(bytes(data))


def test_native_parser_matches_numpy(rng):
    # both parser backends must produce identical structure-of-arrays
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native runtime unavailable")
    from flacx.decoder import parse_stream_header, scan_frame_offsets
    from flacx.hostdec import _parse_frames_native, parse_frames_numpy

    pcm = make_pcm(rng, 512 * 4, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=512)
    si, first = parse_stream_header(data)
    off = scan_frame_offsets(data, first)
    arr = np.frombuffer(data, np.uint8)
    ends = np.append(off[1:], len(data))
    width = int((ends - off).max())
    rows = np.zeros((len(off), width), np.uint8)
    for i, (o, e) in enumerate(zip(off, ends)):
        rows[i, : e - o] = arr[o:e]
    zero = np.zeros(len(off), np.int64)
    a = _parse_frames_native(rows, zero, 512, 2, 16)
    b = parse_frames_numpy(rows, zero, 512, 2, 16)
    for name in ("channel_code", "kind", "order", "shift", "wasted",
                 "residual", "end_bits"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name),
                                      err_msg=name)
    np.testing.assert_array_equal(a.taps[..., :32], b.taps[..., :32])
