"""Streaming (constant-memory) encode path.

The reference encodes arbitrarily long files in O(block) memory via a
lazy generator chain (flac/encoder.py:48-165 fed by
flac/__main__.py:82-92); flacx's streaming driver provides the same
contract at device-batch granularity: ``encode_chunks_to_file`` holds
O(batch_frames · block_size) PCM regardless of stream length and yields
byte-identical output to the in-memory path.
"""

import io
import wave

import numpy as np
import pytest

from flacx import pipeline
from flacx.wavio import read_wav_chunks, wav_info

from conftest import make_pcm

CFG = dict(sample_rate=44100, bps=16, channels=2, block_size=256,
           max_lpc_order=8, qlp_precision=5, partition_orders=(0, 1, 2),
           batch_frames=4)


def _chunk(pcm: np.ndarray, sizes) -> list[np.ndarray]:
    out, at = [], 0
    for s in sizes:
        out.append(pcm[at: at + s])
        at += s
    assert at == pcm.shape[0]
    return out


@pytest.mark.parametrize("n_samples, sizes", [
    # 11.5 blocks: chunk cuts straddle block and batch boundaries
    (256 * 11 + 128, (100, 1000, 1, 555, 768, 392, 128)),
    # exactly one batch
    (256 * 4, (256 * 4,)),
    # shorter than one block (oracle tail only)
    (100, (60, 40)),
])
def test_streaming_matches_inmemory(rng, n_samples, sizes):
    pcm = make_pcm(rng, n_samples, 2, 16, kind="tonal")
    ref = io.BytesIO()
    pipeline.encode_to_file(ref, pcm, **CFG)
    got = io.BytesIO()
    pipeline.encode_chunks_to_file(got, _chunk(pcm, sizes),
                                   total_samples=n_samples, **CFG)
    assert got.getvalue() == ref.getvalue()


def test_streaming_unknown_length_patches_streaminfo(rng):
    """total_samples=None: the writer counts samples and patches the
    Streaminfo count (and MD5) at finalize; the result round-trips."""
    from flacx.decoder import decode_array
    from flacx.decoder import parse_stream_header

    n_samples = 256 * 9 + 77
    pcm = make_pcm(rng, n_samples, 2, 16, kind="noise")
    got = io.BytesIO()
    pipeline.encode_chunks_to_file(
        got, iter(_chunk(pcm, (512, 1700, 95, n_samples - 512 - 1700 - 95))),
        total_samples=None, **CFG)
    stream = got.getvalue()
    si, _ = parse_stream_header(stream)
    assert si.samples == n_samples
    ref = io.BytesIO()
    pipeline.encode_to_file(ref, pcm, **CFG)
    assert stream == ref.getvalue()          # count lands identically
    _, out = decode_array(stream)
    assert np.array_equal(out, pcm)


def test_streaming_oracle_path_matches(rng):
    """device=False streaming (oracle per block) = device=False in-memory."""
    pcm = make_pcm(rng, 256 * 3 + 10, 2, 16, kind="impulse")
    ref = io.BytesIO()
    pipeline.encode_to_file(ref, pcm, device=False, **CFG)
    got = io.BytesIO()
    pipeline.encode_chunks_to_file(got, _chunk(pcm, (300, 478)),
                                   device=False, **CFG)
    assert got.getvalue() == ref.getvalue()


def test_wav_chunk_reader(tmp_path, rng):
    pcm = make_pcm(rng, 1000, 2, 16, kind="tonal")
    path = tmp_path / "t.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm.astype("<i2").tobytes())
    assert wav_info(path) == (44100, 16, 2, 1000)
    chunks = list(read_wav_chunks(path, 300))
    assert [c.shape[0] for c in chunks] == [300, 300, 300, 100]
    assert np.array_equal(np.concatenate(chunks), pcm)


# ---------------------------------------------------------------------------
# Streaming decode (flacx.decoder.decode_stream)

class _Pipe:
    """Unseekable read-only wrapper (a pipe: read() only, bounded pieces)."""

    def __init__(self, data: bytes, piece: int = 997):
        self._data = data
        self._at = 0
        self._piece = piece

    def read(self, n: int = -1) -> bytes:
        n = self._piece if n < 0 else min(n, self._piece)
        out = self._data[self._at: self._at + n]
        self._at += len(out)
        return out


def _encode_bytes(pcm, **over):
    cfg = dict(CFG)
    cfg.pop("batch_frames")
    cfg.update(over)
    buf = io.BytesIO()
    pipeline.encode_to_file(buf, pcm, **cfg)
    return buf.getvalue()


@pytest.mark.parametrize("n_samples, readahead", [
    (256 * 11 + 128, 1 << 12),   # many windows + short oracle tail
    (256 * 4, 1 << 20),          # one window, exact block multiple
    (100, 64),                   # shorter than a block; window growth
])
def test_decode_stream_matches_array(rng, n_samples, readahead):
    from flacx.decoder import decode_array, decode_stream

    pcm = make_pcm(rng, n_samples, 2, 16, kind="tonal")
    data = _encode_bytes(pcm)
    si_ref, ref = decode_array(data, batch_frames=4)
    si, chunks = decode_stream(_Pipe(data), batch_frames=4,
                               readahead=readahead)
    out = np.concatenate(list(chunks), axis=0)
    assert si == si_ref
    assert np.array_equal(out, ref)
    assert np.array_equal(out, pcm)


def test_decode_stream_window_smaller_than_frame(rng):
    """readahead below one frame's byte size: the window must grow until
    a full frame fits, then decode proceeds."""
    from flacx.decoder import decode_stream

    pcm = make_pcm(rng, 256 * 3, 2, 16, kind="noise")
    data = _encode_bytes(pcm)
    _, chunks = decode_stream(_Pipe(data, piece=37), batch_frames=4,
                              readahead=16)
    assert np.array_equal(np.concatenate(list(chunks), axis=0), pcm)


def test_decode_stream_host_path(rng):
    """device=False streams through the strict sequential window path."""
    from flacx.decoder import decode_stream

    pcm = make_pcm(rng, 256 * 5 + 31, 2, 16, kind="impulse")
    data = _encode_bytes(pcm)
    _, chunks = decode_stream(_Pipe(data), device=False, readahead=2048)
    assert np.array_equal(np.concatenate(list(chunks), axis=0), pcm)


def test_decode_stream_truncated_raises(rng):
    from flacx.decoder import decode_stream
    from flacx.oracle.decoder import FlacFormatError

    pcm = make_pcm(rng, 256 * 4, 2, 16, kind="tonal")
    data = _encode_bytes(pcm)
    with pytest.raises(FlacFormatError):
        _, chunks = decode_stream(_Pipe(data[: len(data) - 7]),
                                  readahead=1 << 20)
        list(chunks)
    with pytest.raises(FlacFormatError):
        decode_stream(_Pipe(data[:20]))  # truncated inside the header


def test_decode_stream_corrupt_payload_raises(rng):
    """A flipped payload byte must fail CRC in every path, not emit PCM."""
    from flacx.decoder import decode_stream, parse_stream_header
    from flacx.oracle.decoder import FlacFormatError

    pcm = make_pcm(rng, 256 * 4, 2, 16, kind="noise")
    data = bytearray(_encode_bytes(pcm))
    _, first = parse_stream_header(bytes(data))
    data[first + 40] ^= 0x55             # inside the first frame's payload
    with pytest.raises(FlacFormatError):
        _, chunks = decode_stream(_Pipe(bytes(data)))
        list(chunks)


def test_decode_stream_wav_writer_roundtrip(tmp_path, rng):
    """CLI-equivalent plumbing: decode_stream → write_wav_chunks."""
    from flacx.decoder import decode_stream
    from flacx.wavio import read_wav, write_wav_chunks

    pcm = make_pcm(rng, 256 * 6 + 99, 2, 16, kind="tonal")
    data = _encode_bytes(pcm)
    si, chunks = decode_stream(_Pipe(data), readahead=4096)
    path = tmp_path / "out.wav"
    n = write_wav_chunks(path, si.sample_rate, si.sample_size,
                         si.channels, chunks)
    assert n == pcm.shape[0]
    sr, bps, ch, got = read_wav(path)
    assert (sr, bps, ch) == (44100, 16, 2)
    assert np.array_equal(got, pcm)
