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


@pytest.mark.parametrize("bps", [12, 20])
def test_non_byte_aligned_sample_sizes(rng, bps):
    """12/20-bit streams (reference flac/common.py:249-256 codes) round-trip
    through the device pipeline with a strict MD5-verified oracle decode:
    streaminfo MD5 covers ceil(bps/8)-byte LE samples (RFC 9639 §8.2)."""
    from flacx.oracle import decode_stream
    from flacx.pipeline import encode_to_file

    pcm = make_pcm(rng, 512 * 3, 2, bps, "tonal")
    buf = io.BytesIO()
    encode_to_file(buf, pcm, sample_rate=44100, bps=bps, channels=2,
                   block_size=512, max_lpc_order=4, qlp_precision=5,
                   partition_orders=(0, 1, 2), batch_frames=2)
    data = buf.getvalue()
    _, got = decode_array(data)
    np.testing.assert_array_equal(got, pcm)
    *_, rows = decode_stream(io.BytesIO(data))
    strict = np.array([list(r) for r in rows], np.int32)
    np.testing.assert_array_equal(strict, pcm)


@pytest.mark.parametrize("channels", [3, 4, 5, 7, 8])
def test_all_channel_counts_roundtrip(rng, channels):
    """Every FLAC channel count 1-8 (reference flac/common.py:199-227
    codes; 1/2/6 covered elsewhere) round-trips through the device
    pipeline and the batched decoder."""
    from flacx.pipeline import encode_to_file

    pcm = make_pcm(rng, 512 * 2, channels, 16, "tonal")
    buf = io.BytesIO()
    encode_to_file(buf, pcm, sample_rate=44100, bps=16, channels=channels,
                   block_size=512, max_lpc_order=4, qlp_precision=5,
                   partition_orders=(0, 1), batch_frames=2)
    _, got = decode_array(buf.getvalue())
    np.testing.assert_array_equal(got, pcm)


@pytest.mark.parametrize("sr", [44101, 655350])
def test_uncommon_sample_rate_roundtrip(rng, sr):
    """Rates outside the 4-bit table use the uncommon 8/16-bit header
    forms (reference flac/decoder.py:160-171) end to end, not just in
    the format-layer unit tests."""
    from flacx.pipeline import encode_to_file

    pcm = make_pcm(rng, 512 * 2, 2, 16, "tonal")
    buf = io.BytesIO()
    encode_to_file(buf, pcm, sample_rate=sr, bps=16, channels=2,
                   block_size=512, max_lpc_order=4, qlp_precision=5,
                   partition_orders=(0, 1), batch_frames=2)
    si, got = decode_array(buf.getvalue())
    assert si.sample_rate == sr
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


# ---------------------------------------------------------------------------
# Adversarial / robustness (VERDICT round-1 item 3)


def test_adversarial_fake_sync_resolved_bit_exact(rng):
    """A CRC-8-valid fake frame header embedded in a verbatim payload must
    not displace real frame boundaries: the scan resolves the duplicate
    coded number by CRC-16 of the previous frame span and the batch path
    decodes bit-exactly without any sequential fallback.
    """
    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    n = 256

    def encode_device(pcm):
        # exact-size selection picks VERBATIM for full-range uniform noise,
        # so the payload bytes are the raw samples (byte-aligned for mono)
        cfg = EncoderConfig(block_size=n, max_lpc_order=6, channels=1,
                            partition_orders=(0, 1, 2))
        enc = BatchEncoder(cfg, batch_frames=3)
        planar = pcm.reshape(3, n, 1).transpose(0, 2, 1).astype(np.int32)
        return (MAGIC
                + serialize_metadata_header(True,
                                            MetadataBlockType.Streaminfo, 34)
                + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 1, 16,
                                                  3 * n, bytes(16)))
                + b"".join(enc.encode_frames(planar, 0)))

    pcm = rng.integers(-32768, 32767, size=(n * 3, 1)).astype(np.int32)
    data = encode_device(pcm)
    si, first = parse_stream_header(data)
    offsets = scan_frame_offsets(data, first)
    assert len(offsets) == 3
    hdr1 = data[offsets[1]: offsets[1] + 6]      # frame 1's header + CRC-8
    assert hdr1[:2] == b"\xff\xf8"

    # embed frame 1's header bytes into frame 0's PCM
    vals = np.frombuffer(hdr1, ">i2").astype(np.int32)
    pcm2 = pcm.copy()
    pcm2[10:13, 0] = vals
    data2 = encode_device(pcm2)
    assert data2.count(hdr1) >= 2, "fake sync was not embedded verbatim"

    si2, first2 = parse_stream_header(data2)
    offsets2 = scan_frame_offsets(data2, first2)
    np.testing.assert_array_equal(offsets2, scan_frame_offsets(data2, first2))
    assert len(offsets2) == 3
    assert offsets2[0] == first2

    import flacx.decoder as dec

    real_seq = dec._decode_sequential
    calls = []

    def counting_seq(*a, **k):
        calls.append(1)
        return real_seq(*a, **k)

    try:
        dec._decode_sequential = counting_seq
        _, got = decode_array(data2)
    finally:
        dec._decode_sequential = real_seq
    np.testing.assert_array_equal(got, pcm2)
    assert not calls, "fake sync should be resolved on the batch path"


def test_nonzero_first_frame_number(rng, monkeypatch):
    """A stream cut mid-file (first coded number != 0) batch-decodes."""
    import flacx.decoder as dec
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    n = 512
    pcm = make_pcm(rng, n * 6, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=n)
    si, first = parse_stream_header(data)
    offsets = scan_frame_offsets(data, first)
    cut = (MAGIC
           + serialize_metadata_header(True, MetadataBlockType.Streaminfo, 34)
           + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                             3 * n, bytes(16)))
           + data[offsets[3]:])

    def no_fallback(*a, **k):
        raise AssertionError("batch path should not have fallen back")

    monkeypatch.setattr(dec, "_decode_sequential", no_fallback)
    _, got = dec.decode_array(cut)
    np.testing.assert_array_equal(got, pcm[3 * n:])


def test_crc16_mismatch_falls_back_not_raise(rng, monkeypatch):
    """Displaced boundaries from a fooled scan must fall back to the
    sequential decoder (which is always correct), never raise on a valid
    stream."""
    import flacx.decoder as dec

    n = 512
    pcm = make_pcm(rng, n * 4, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=n)
    real_scan = dec._scan_frame_offsets

    def displaced(d, first, **kw):
        off, amb = real_scan(d, first, **kw)
        off = off.copy()
        off[2] += 7          # displace one boundary -> CRC-16 mismatch
        return off, amb

    monkeypatch.setattr(dec, "_scan_frame_offsets", displaced)
    _, got = dec.decode_array(data)
    np.testing.assert_array_equal(got, pcm)


# ---------------------------------------------------------------------------
# Crafted-stream validation (ADVICE round-1: reserved types, negative
# shift, invalid partition order must raise, not decode garbage)


def _craft_frame_row(subframe_bits, n_pad=64):
    """Minimal mono frame header + crafted subframe bit fields."""
    from flacx.bitio import BitWriter

    w = BitWriter()
    w.write_uint(0xFFF8, 16)
    w.write_uint(8, 4)       # block size code (256)
    w.write_uint(9, 4)       # sample rate code (44100)
    w.write_uint(0, 4)       # mono
    w.write_uint(4, 3)       # 16-bit
    w.write_uint(0, 1)
    w.write_uint(0, 8)       # coded number 0
    w.write_uint(0, 8)       # header CRC (parsers don't re-check)
    for value, nbits in subframe_bits:
        w.write_uint(value & ((1 << nbits) - 1), nbits)
    w.write_uint(0, n_pad)
    w.pad_to_byte()
    row = np.frombuffer(w.getvalue(), np.uint8)
    return row[None, :].copy()


@pytest.mark.parametrize("case,fields", [
    ("reserved_type_2", [(0, 1), (2, 6), (0, 1)]),
    ("reserved_type_13", [(0, 1), (13, 6), (0, 1)]),
    ("negative_lpc_shift", [(0, 1), (32, 6), (0, 1),     # LPC order 1
                            (123, 16),                   # warmup
                            (4, 4), (0b11111, 5)]),      # prec, shift=-1
    ("reserved_method", [(0, 1), (8, 6), (0, 1),         # fixed order 0
                         (2, 2), (0, 4)]),               # method 2
    ("lpc_precision_15", [(0, 1), (32, 6), (0, 1),
                          (123, 16), (15, 4)]),
])
def test_crafted_stream_validation(case, fields):
    from flacx.hostdec import parse_frames_numpy, _parse_frames_native
    import flacx.native as native

    row = _craft_frame_row(fields)
    start = np.zeros(1, np.int64)
    with pytest.raises(ValueError):
        parse_frames_numpy(row, start, 256, 1, 16)
    if native.lib() is not None:
        with pytest.raises(ValueError):
            _parse_frames_native(row, start, 256, 1, 16)


def test_crafted_invalid_partition_order():
    # fixed order 0, method 0, partition order 3 with block 100 (100 % 8 != 0)
    from flacx.hostdec import parse_frames_numpy, _parse_frames_native
    import flacx.native as native

    fields = [(0, 1), (8, 6), (0, 1), (0, 2), (3, 4)]
    row = _craft_frame_row(fields, n_pad=512)
    start = np.zeros(1, np.int64)
    with pytest.raises(ValueError):
        parse_frames_numpy(row, start, 100, 1, 16)
    if native.lib() is not None:
        with pytest.raises(ValueError):
            _parse_frames_native(row, start, 100, 1, 16)


# ---------------------------------------------------------------------------
# Device decode path (round-2: on-device bit-unpack + reconstruction)


def test_device_decode_path_is_used(rng, monkeypatch):
    """With host-parse and sequential fallbacks disabled, the device path
    alone must decode bit-exactly (proves no silent fallback)."""
    import flacx.decoder as dec
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native walker unavailable")

    def boom(*a, **k):
        raise AssertionError("fallback path used")

    monkeypatch.setattr(dec, "_decode_rows", boom)
    monkeypatch.setattr(dec, "_decode_sequential", boom)

    for kind in ("tonal", "noise", "impulse", "silence"):
        pcm = make_pcm(rng, 512 * 5, 2, 16, kind)
        data = encode_bytes(pcm, block_size=512)
        _, got = dec.decode_array(data, batch_frames=3)
        np.testing.assert_array_equal(got, pcm)


def test_device_decode_24bit_and_mono(rng, monkeypatch):
    import flacx.decoder as dec
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native walker unavailable")

    def boom(*a, **k):
        raise AssertionError("fallback path used")

    monkeypatch.setattr(dec, "_decode_rows", boom)
    monkeypatch.setattr(dec, "_decode_sequential", boom)

    pcm = make_pcm(rng, 512 * 3, 2, 24, "tonal")
    data = encode_bytes(pcm, sample_rate=96000, bps=24, block_size=512,
                        lpc_order=range(0, 17))
    _, got = dec.decode_array(data)
    np.testing.assert_array_equal(got, pcm)

    pcm = make_pcm(rng, 512 * 4, 1, 16, "noise")
    data = encode_bytes(pcm, block_size=512)
    _, got = dec.decode_array(data)
    np.testing.assert_array_equal(got, pcm)


def test_device_decode_chunk_kernel_matches_host_parse(rng):
    """parse_residual_chunks must agree with the full host parser on the
    zigzag-decoded residual values for every subframe of a real stream."""
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native walker unavailable")
    import jax.numpy as jnp
    from flacx.hostdec import parse_frames_numpy
    from flacx.ops.bitunpack import bytes_to_words, parse_residual_chunks

    n = 384
    pcm = make_pcm(rng, n * 5, 2, 16, "tonal")
    data = encode_bytes(pcm, block_size=n)
    si, first = parse_stream_header(data)
    off = scan_frame_offsets(data, first)
    arr = np.frombuffer(data, np.uint8)
    ends = np.append(off[1:], len(data))
    width = (int((ends - off).max()) + 3) // 4 * 4
    rows = np.zeros((len(off), width), np.uint8)
    for i, (o, e) in enumerate(zip(off, ends)):
        rows[i, : e - o] = arr[o:e]
    zero = np.zeros(len(off), np.int64)

    scan = native.scan_frames(rows, zero, n, 2, 16)
    ref = parse_frames_numpy(rows, zero, n, 2, 16)

    # size the per-chunk window bucket as the decoder does (an
    # undersized bucket correctly flags err and falls back)
    span = 64 + int(np.diff(scan.ckpt_pos, axis=-1).max())
    vals, err = parse_residual_chunks(
        bytes_to_words(jnp.asarray(rows)), jnp.asarray(scan.ckpt_pos),
        jnp.asarray(scan.ckpt_param), jnp.asarray(scan.ckpt_esc),
        jnp.asarray(scan.ckpt_inesc), jnp.asarray(scan.kind),
        jnp.asarray(scan.order), jnp.asarray(scan.po),
        jnp.asarray(scan.width), n, scan.ckpt_interval,
        span_words=span // 32 + 4)
    assert not bool(err)
    got = np.asarray(vals)
    # compare residual positions (warmup lives elsewhere in the device path)
    for f in range(len(off)):
        for c in range(2):
            o = int(ref.order[f, c])
            if ref.kind[f, c] >= 2 or ref.kind[f, c] == 1:
                np.testing.assert_array_equal(
                    got[f, c, o:], ref.residual[f, c, o:],
                    err_msg=f"frame {f} ch {c}")


def test_device_decode_long_unary_falls_back(rng, monkeypatch):
    """A symbol wider than one 64-bit window must flag an error and punt
    to the host parser, never decode wrong values."""
    import flacx.decoder as dec
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native walker unavailable")
    from flacx.bitio import BitWriter
    from flacx.crc import crc16, crc8

    # hand-build a frame with a pathological q=70 Rice code (k=0):
    # mono 16-bit, block 256, fixed order 0, partition order 0
    n = 256
    w = BitWriter()
    w.write_uint(0xFFF8, 16)
    w.write_uint(8, 4)       # block 256
    w.write_uint(9, 4)       # 44100
    w.write_uint(0, 4)       # mono
    w.write_uint(4, 3)
    w.write_uint(0, 1)
    w.write_uint(0, 8)       # frame 0
    w.write_uint(crc8(w.getvalue() if False else b"") if False else 0, 0)
    hdr = w.getvalue()
    w2 = BitWriter()
    w2.write_bytes(hdr)
    w2.write_uint(crc8(hdr), 8)
    w2.write_uint(0, 1)
    w2.write_uint(8, 6)      # fixed order 0
    w2.write_uint(0, 1)
    w2.write_uint(0, 2)      # rice method 4-bit
    w2.write_uint(0, 4)      # partition order 0
    w2.write_uint(0, 4)      # parameter k=0
    w2.write_unary(70)       # first sample: zigzag 70 -> q=70 > 63
    for _ in range(n - 1):
        w2.write_unary(0)
    w2.pad_to_byte()
    body = w2.getvalue()
    frame = body + crc16(body).to_bytes(2, "big")

    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)
    stream = (MAGIC
              + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                          34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 1, 16, n,
                                                bytes(16)))
              + frame)
    _, got = dec.decode_array(stream)
    want = np.zeros((n, 1), np.int32)
    want[0, 0] = 35          # zigzag_decode(70)
    np.testing.assert_array_equal(got, want)


def test_device_decode_fixed_only_parallel_path(rng, monkeypatch):
    """An all-fixed batch must decode through the parallel cumsum
    reconstruction (no sample-serial scan), bit-exactly, with the host
    and sequential fallbacks disabled."""
    import flacx.decoder as dec
    import flacx.native as native
    import flacx.ops.reconstruct as rec
    if native.lib() is None:
        pytest.skip("native walker unavailable")

    def boom(*a, **k):
        raise AssertionError("unexpected path used")

    monkeypatch.setattr(dec, "_decode_rows", boom)
    monkeypatch.setattr(dec, "_decode_sequential", boom)
    # the scan must not be traced at all for a fixed-only batch
    monkeypatch.setattr(rec, "reconstruct_predicted", boom)

    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    n, b = 384, 6
    pcm = make_pcm(rng, n * b, 2, 16, "tonal")
    cfg = EncoderConfig(block_size=n, max_lpc_order=0)  # fixed-only encode
    enc = BatchEncoder(cfg, batch_frames=b)
    planar = pcm.reshape(b, n, 2).transpose(0, 2, 1).astype(np.int32)
    result = enc.encode_batch_device(planar, 0)
    lens = np.asarray(result["length"])
    data = np.asarray(result["bytes"])
    stream = (MAGIC
              + serialize_metadata_header(True,
                                          MetadataBlockType.Streaminfo, 34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                n * b, bytes(16)))
              + b"".join(data[i, : lens[i]].tobytes() for i in range(b)))
    _, got = dec.decode_array(stream, batch_frames=b)
    np.testing.assert_array_equal(got, pcm)


def _encode_device_stream(pcm, block_size: int, max_lpc_order: int) -> bytes:
    """Device-encode full blocks of ``pcm`` into a FLAC stream (the device
    encoder picks LPC where it genuinely wins, unlike the reference-parity
    oracle whose LPC is sign-defective — see flacx/encoder.py)."""
    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    frames, channels = pcm.shape
    n = block_size
    b = frames // n
    cfg = EncoderConfig(block_size=n, max_lpc_order=max_lpc_order)
    enc = BatchEncoder(cfg, batch_frames=b)
    planar = pcm.reshape(b, n, channels).transpose(0, 2, 1).astype(np.int32)
    blobs = enc.encode_frames(planar, 0)
    return (MAGIC
            + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                        34)
            + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, channels,
                                              16, frames, bytes(16)))
            + b"".join(blobs))


def _make_ar_pcm(rng, frames: int, channels: int, bps: int) -> np.ndarray:
    """An AR(4) process — content where LPC genuinely beats the fixed
    (finite-difference) predictors, so the encoder emits LPC subframes."""
    amp = (1 << (bps - 1)) - 1
    a = np.array([2.2, -2.15, 1.1, -0.28])   # stable resonant AR(4)
    out = np.zeros((frames, channels))
    for c in range(channels):
        e = rng.standard_normal(frames) * 0.02
        x = np.zeros(frames)
        for i in range(frames):
            for j, aj in enumerate(a):
                if i - 1 - j >= 0:
                    x[i] += aj * x[i - 1 - j]
            x[i] += e[i]
        x /= max(1.0, np.abs(x).max() * 1.25)
        out[:, c] = x * amp * 0.8
    return out.astype(np.int64).astype(np.int32)


def test_chunk_parallel_lpc_reconstruction_matches_serial(rng):
    """The walker's inline-IIR sample-state checkpoints plus the chunked
    device scan must reproduce the serial scan bit-exactly on LPC content
    (the C++ and device IIRs are two implementations of the same integer
    recurrence, flac/decoder.py:493-498)."""
    import flacx.native as native
    if native.lib() is None:
        pytest.skip("native walker unavailable")
    import jax.numpy as jnp
    from flacx.hostdec import parse_frames_numpy
    from flacx.ops.reconstruct import (reconstruct_predicted,
                                       reconstruct_predicted_chunks)

    n, ss = 512, 64                       # 8 chunks per subframe
    pcm = _make_ar_pcm(rng, n * 4, 2, 16)
    data = _encode_device_stream(pcm, block_size=n, max_lpc_order=8)
    si, first = parse_stream_header(data)
    off = scan_frame_offsets(data, first)
    arr = np.frombuffer(data, np.uint8)
    ends = np.append(off[1:], len(data))
    width = (int((ends - off).max()) + 3) // 4 * 4
    rows = np.zeros((len(off), width), np.uint8)
    for i, (o, e) in enumerate(zip(off, ends)):
        rows[i, : e - o] = arr[o:e]
    zero = np.zeros(len(off), np.int64)

    scan = native.scan_frames(rows, zero, n, 2, 16, state_interval=ss)
    assert scan.ckpt_state.shape == (len(off), 2, n // ss, 32)
    ref = parse_frames_numpy(rows, zero, n, 2, 16)
    assert (ref.kind >= 3).any()          # the stream really has LPC

    res = jnp.asarray(ref.residual)       # warmup in positions < order
    taps = jnp.asarray(ref.taps.astype(np.int32))
    shift = jnp.asarray(ref.shift.astype(np.int32))
    order = jnp.asarray(ref.order.astype(np.int32))
    want = np.asarray(reconstruct_predicted(res, taps, shift, order))
    got = np.asarray(reconstruct_predicted_chunks(
        res, taps, shift, order, jnp.asarray(scan.ckpt_state), ss))
    np.testing.assert_array_equal(got, want)
    # and int32 fast path
    got32 = np.asarray(reconstruct_predicted_chunks(
        res, taps, shift, order, jnp.asarray(scan.ckpt_state), ss,
        dtype=jnp.int32))
    np.testing.assert_array_equal(got32.astype(np.int64), want)


def test_device_decode_lpc_chunk_parallel_path(rng, monkeypatch):
    """LPC batches must decode through the chunk-parallel reconstruction
    (the serial scan must not be traced), bit-exactly, with the host and
    sequential fallbacks disabled."""
    import flacx.decoder as dec
    import flacx.native as native
    import flacx.ops.reconstruct as rec
    if native.lib() is None:
        pytest.skip("native walker unavailable")

    def boom(*a, **k):
        raise AssertionError("unexpected path used")

    monkeypatch.setattr(dec, "_decode_rows", boom)
    monkeypatch.setattr(dec, "_decode_sequential", boom)
    monkeypatch.setattr(rec, "reconstruct_predicted", boom)
    # the chunk-parallel path is gated on host core count (the inline IIR
    # only pays when the walker threads across rows) — force it on
    monkeypatch.setattr(dec, "CHUNK_STATE_MIN_CORES", 1)
    dec._DEVICE_FNS.clear()               # force a fresh trace

    n = 512
    pcm = _make_ar_pcm(rng, n * 5, 2, 16)
    data = _encode_device_stream(pcm, block_size=n, max_lpc_order=8)
    _, got = dec.decode_array(data, batch_frames=5)
    np.testing.assert_array_equal(got, pcm)


def _patch_sample_size(frame: bytes, ss_code: int) -> bytes:
    """Rewrite a frame header's sample-size code (explicit override form)
    and fix up the header CRC-8 and frame CRC-16."""
    import flacx.coded_number as cn
    from flacx.crc import crc8, crc16

    b = bytearray(frame)
    b[3] = (b[3] & 0xF1) | (ss_code << 1)
    extra = cn.following_bytes(b[4])
    bs_code, sr_code = b[2] >> 4, b[2] & 0xF
    hdr = (5 + extra + (1 if bs_code == 6 else 2 if bs_code == 7 else 0)
           + (1 if sr_code == 12 else 2 if sr_code in (13, 14) else 0))
    b[hdr] = crc8(bytes(b[:hdr]))
    b[-2:] = crc16(bytes(b[:-2])).to_bytes(2, "big")
    return bytes(b)


def test_sample_size_override_batch_decode(rng, monkeypatch):
    """Frames carrying explicit per-frame sample-size codes — including a
    MIX of widths in one stream — decode through the batch path with no
    sequential fallback (VERDICT r3 item 5; reference handles these in
    its one path, flac/decoder.py:186-229)."""
    import flacx.decoder as dec
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle.encoder import (EncoderParameters, encode_frame,
                                      serialize_metadata_header,
                                      serialize_streaminfo)

    n, nframes = 256, 12
    params = EncoderParameters(block_size=n)
    frames = []
    pcm_all = np.zeros((nframes * n, 2), np.int64)
    for i in range(nframes):
        bpsf = 16 if i % 2 == 0 else 12
        pcm = make_pcm(rng, n, 2, bpsf, "tonal").astype(np.int64)
        pcm_all[i * n: (i + 1) * n] = pcm
        planar = [list(map(int, pcm[:, c])) for c in range(2)]
        from flacx.format import Channels
        fr = encode_frame(planar, Channels.L_R, i, bpsf, params)
        if bpsf != 16:
            fr = _patch_sample_size(fr, 2)      # explicit 12-bit code
        frames.append(fr)

    stream = (MAGIC
              + serialize_metadata_header(True,
                                          MetadataBlockType.Streaminfo, 34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                nframes * n, bytes(16)))
              + b"".join(frames))

    def _no_fallback(*a, **k):
        raise AssertionError("sequential fallback must not run")

    monkeypatch.setattr(dec, "_decode_sequential", _no_fallback)
    si, got = dec.decode_array(stream, batch_frames=8)
    np.testing.assert_array_equal(got, pcm_all)

    # uniform-override stream (every frame explicit 12-bit)
    frames12 = []
    for i in range(nframes):
        pcm = pcm_all[i * n: (i + 1) * n]
        pcm12 = np.clip(pcm, -(1 << 11), (1 << 11) - 1)
        planar = [list(map(int, pcm12[:, c])) for c in range(2)]
        from flacx.format import Channels
        frames12.append(_patch_sample_size(
            encode_frame(planar, Channels.L_R, i, 12, params), 2))
    stream12 = (MAGIC
                + serialize_metadata_header(
                    True, MetadataBlockType.Streaminfo, 34)
                + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                  nframes * n, bytes(16)))
                + b"".join(frames12))
    si12, got12 = dec.decode_array(stream12, batch_frames=8)
    want12 = np.clip(pcm_all, -(1 << 11), (1 << 11) - 1)
    np.testing.assert_array_equal(got12, want12)


def test_frame_headers_rate_override_metadata(rng):
    """Frames whose RATE field contradicts Streaminfo must surface their
    own per-frame metadata (reference header objects,
    flac/decoder.py:133-229) while the PCM still decodes bit-exactly —
    payload math is rate-independent (VERDICT r4 item 8)."""
    import numpy as np
    from flacx.crc import crc8, crc16
    from flacx.decoder import decode_array, frame_headers, \
        scan_frame_offsets, parse_stream_header
    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import (MAGIC, MetadataBlockType, Streaminfo,
                              SAMPLE_RATE_ENCODING)
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)
    from conftest import make_pcm

    cfg = EncoderConfig(block_size=256, max_lpc_order=4)
    n, f = cfg.block_size, 6
    enc = BatchEncoder(cfg, batch_frames=f)
    pcm = make_pcm(rng, f * n, 2, 16, "tonal").astype(np.int32)
    planar = np.ascontiguousarray(
        pcm.reshape(f, n, 2).transpose(0, 2, 1))
    frames = enc.encode_frames(planar, 0)
    stream = (MAGIC
              + serialize_metadata_header(True,
                                          MetadataBlockType.Streaminfo, 34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                f * n, bytes(16)))
              + b"".join(frames))

    # baseline: all frames report the streaminfo rate
    fh0 = frame_headers(stream)
    assert (fh0["sample_rate"] == 44100).all()
    assert (fh0["block_size"] == n).all()
    assert (fh0["bps"] == 16).all()

    # hand-patch every frame header's rate nibble to 48 kHz and repair
    # the header CRC-8 and frame CRC-16
    data = bytearray(stream)
    _, first = parse_stream_header(stream)
    offs = scan_frame_offsets(stream, first).tolist()
    ends = offs[1:] + [len(stream)]
    for off, end in zip(offs, ends):
        data[off + 2] = (data[off + 2] & 0xF0) | SAMPLE_RATE_ENCODING[48000]
        # common forms + 1-byte coded number → 5 header bytes, CRC-8 next
        assert data[off + 4] < 0x80
        data[off + 5] = crc8(bytes(data[off: off + 5]))
        c16 = crc16(bytes(data[off: end - 2]))
        data[end - 2] = c16 >> 8
        data[end - 1] = c16 & 0xFF
    patched = bytes(data)

    fh = frame_headers(patched)
    assert fh["offset"].tolist() == offs
    assert (fh["sample_rate"] == 48000).all()
    assert (fh["bps"] == 16).all()
    assert fh["number"].tolist() == list(range(f))
    assert (fh["blocking_strategy"] == 0).all()

    _, got = decode_array(patched, batch_frames=f)
    np.testing.assert_array_equal(got, pcm)
