"""Oracle codec: round-trip, reference byte-compat, defect fixes.

The reference implementation (read-only at /root/reference) is used as
ground truth where available; those tests skip gracefully elsewhere.
"""

import io
import sys

import numpy as np
import pytest

from flacx.oracle import EncoderParameters, decode_stream, encode_stream

from conftest import make_pcm

REFERENCE_PATH = "/root/reference"


def _reference_modules():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import flac.decoder
        import flac.encoder
        return flac.encoder, flac.decoder
    except ImportError:  # pragma: no cover
        pytest.skip("reference implementation not available")


def oracle_encode_bytes(pcm: np.ndarray, sample_rate=44100, bps=16,
                        **kwargs) -> bytes:
    frames, channels = pcm.shape
    params = EncoderParameters(**kwargs)
    rows = (list(map(int, pcm[i])) for i in range(frames))
    return b"".join(encode_stream(sample_rate, bps, channels, frames,
                                  rows, params))


def oracle_decode_pcm(data: bytes) -> np.ndarray:
    sr, bps, ch, n, rows = decode_stream(io.BytesIO(data))
    out = np.array([row for row in rows], dtype=np.int64)
    assert out.shape[0] == n
    return out


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["tonal", "noise", "impulse"])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_block_multiple(rng, kind, channels):
    pcm = make_pcm(rng, 1152 * 2, channels, 16, kind)
    data = oracle_encode_bytes(pcm, block_size=1152)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


def test_roundtrip_partial_final_block(rng):
    pcm = make_pcm(rng, 1152 + 391, 2, 16, "tonal")
    data = oracle_encode_bytes(pcm, block_size=1152)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


def test_roundtrip_silence_constant(rng):
    # the reference crashes on digital silence (SURVEY.md §2.3.2)
    pcm = make_pcm(rng, 1024, 2, 16, "silence")
    data = oracle_encode_bytes(pcm, block_size=256)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)
    # silence must compress to almost nothing (constant subframes)
    assert len(data) < 300


def test_roundtrip_mono(rng):
    # the reference corrupts mono files (hardcoded stereo header, §2.3.1)
    pcm = make_pcm(rng, 2048, 1, 16, "tonal")
    data = oracle_encode_bytes(pcm, block_size=1024)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_sample_sizes(rng, bps):
    pcm = make_pcm(rng, 1024, 2, bps, "tonal")
    data = oracle_encode_bytes(pcm, bps=bps, block_size=512)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


def test_roundtrip_high_lpc_order_hires(rng):
    pcm = make_pcm(rng, 2048, 2, 24, "tonal")
    data = oracle_encode_bytes(pcm, sample_rate=96000, bps=24,
                               block_size=1024,
                               lpc_order=range(0, 33),
                               rice_partition_order=range(0, 7))
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


def test_subset_guard():
    with pytest.raises(ValueError):
        oracle_encode_bytes(np.zeros((64, 2), np.int32), sample_rate=44100,
                            lpc_order=range(0, 33), block_size=64)


# ---------------------------------------------------------------------------
# Ground truth: byte-identity and cross-decode against the reference


def reference_encode_bytes(pcm: np.ndarray, sample_rate=44100, bps=16,
                           block_size=4608) -> bytes:
    ref_enc, _ = _reference_modules()
    frames, channels = pcm.shape
    params = ref_enc.EncoderParameters(
        block_size=block_size, rice_partition_order=range(0, 6),
        lpc_order=range(0, 13), qlp_precision=5)
    rows = (list(map(int, pcm[i])) for i in range(frames))
    return b"".join(ref_enc.encode(sample_rate, bps, channels, frames,
                                   rows, params))


def test_byte_identical_with_reference(rng):
    pcm = make_pcm(rng, 4608 * 2, 2, 16, "tonal")
    theirs = reference_encode_bytes(pcm)
    ours = oracle_encode_bytes(pcm)
    assert ours == theirs


def test_byte_identical_with_reference_noise(rng):
    pcm = make_pcm(rng, 1152 * 3, 2, 16, "noise")
    theirs = reference_encode_bytes(pcm, block_size=1152)
    ours = oracle_encode_bytes(pcm, block_size=1152)
    assert ours == theirs


def test_decode_reference_stream(rng):
    # our strict decoder (CRC verification ON) accepts reference output
    pcm = make_pcm(rng, 4608 + 1000, 2, 16, "tonal")
    data = reference_encode_bytes(pcm)
    got = oracle_decode_pcm(data)
    np.testing.assert_array_equal(got, pcm)


def test_reference_decodes_our_stream(rng):
    _, ref_dec = _reference_modules()
    pcm = make_pcm(rng, 1152 * 2 + 70, 2, 16, "tonal")
    data = oracle_encode_bytes(pcm, block_size=1152)
    sr, bps, ch, n, rows = ref_dec.decode(io.BytesIO(data))
    got = np.array([row for row in rows], dtype=np.int64)
    assert (sr, bps, ch, n) == (44100, 16, 2, pcm.shape[0])
    np.testing.assert_array_equal(got, pcm)


def test_crc_verification_rejects_corruption(rng):
    pcm = make_pcm(rng, 512, 2, 16, "tonal")
    data = bytearray(oracle_encode_bytes(pcm, block_size=512))
    data[-10] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(Exception):
        oracle_decode_pcm(bytes(data))
