"""Escaped Rice partition emission (VERDICT item 7).

The FLAC grammar allows a partition to store raw E-bit two's-complement
residuals behind an all-ones parameter marker (flac/decoder.py:387-411).
The reference decodes them but can never WRITE them (NotImplementedError,
flac/encoder.py:770-772); flacx emits them wherever strictly smaller than
every eligible Rice parameter — typically near-uniform huge residuals
that the 32-bit symbol cap would otherwise force into expensive high-k
codes or whole-subframe verbatim.
"""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_pcm
from flacx.encoder import BatchEncoder, EncoderConfig
from flacx.format import MAGIC, MetadataBlockType, Streaminfo
from flacx.ops.rice import exact_plan, zigzag
from flacx.oracle.encoder import (EncoderParameters, serialize_metadata_header,
                                  serialize_streaminfo)


def _burst_pcm(rng, n_samples: int, lo: int, hi: int,
               burst: slice) -> np.ndarray:
    """Quiet stereo noise with one channel-0 burst of near-full-scale
    noise (unpredictable, near-uniform magnitude → escape territory).

    Magnitudes must stay within the declared bps (int16 here): samples
    outside [-2^15, 2^15) are invalid input for a 16-bit stream — the
    encoder writes warm-up/verbatim samples in bps-bit fields, so
    out-of-range values wrap by ±65536 (garbage in, garbage out; the
    reference encoder behaves the same)."""
    pcm = rng.integers(-3, 4, size=(n_samples, 2)).astype(np.int32)
    width = burst.stop - burst.start
    mag = rng.integers(lo, hi, size=width)
    pcm[burst, 0] = np.where(rng.random(width) < 0.5, mag, -mag)
    return pcm


def test_exact_plan_prefers_escape_on_uniform_huge_partition():
    n, psize = 1152, 72
    zz = np.ones((1, n), np.int64) * 2
    zz[0, :psize] = (1 << 17) - np.arange(psize)  # near-uniform 17-bit
    order = jnp.asarray([0])
    args = (jnp.asarray(zz), order, (0, 1, 2, 3, 4), (0, 1, 2, 3, 4), 23)
    esc = exact_plan(*args)
    rice_only = exact_plan(*args, allow_escape=False)
    assert bool(esc.esc_sample.any())
    assert not bool(rice_only.esc_sample.any())
    assert int(esc.bits[0]) < int(rice_only.bits[0])
    # escape size = bitlen(max zz): 18 in the burst partition; the quiet
    # zz=2 partitions escape too (E=2/sample beats Rice k=0's 3/sample)
    e = np.asarray(esc.k_sample)[0][np.asarray(esc.esc_sample)[0]]
    assert (e[:psize] == 18).all() and set(e.tolist()) == {18, 2}


def _encode_stream(pcm, escapes: bool, n: int) -> bytes:
    b = pcm.shape[0] // n
    cfg = EncoderConfig(block_size=n, max_lpc_order=8, escapes=escapes)
    enc = BatchEncoder(cfg, batch_frames=b)
    planar = pcm.reshape(b, n, 2).transpose(0, 2, 1)
    result = enc.encode_batch_device(planar, 0)
    lens = np.asarray(result["length"])
    data = np.asarray(result["bytes"])
    return (MAGIC
            + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                        34)
            + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                              n * b, bytes(16)))
            + b"".join(data[i, : lens[i]].tobytes() for i in range(b)))


def test_device_escape_beats_rice_and_verbatim_and_roundtrips(rng):
    """The VERDICT §7 done-criterion: a burst-in-quiet frame where the
    escaped encoding beats the best escape-free encoding (which itself
    chooses the better of capped-Rice and verbatim), decoded bit-exactly
    by flacx's batch decoder, the strict oracle AND the reference."""
    n = 1152
    pcm = _burst_pcm(rng, 2 * n, 30000, 32768, slice(100, 100 + 72))

    stream_esc = _encode_stream(pcm, True, n)
    stream_rice = _encode_stream(pcm, False, n)
    assert len(stream_esc) < len(stream_rice)

    from flacx.decoder import decode_array
    _, got = decode_array(stream_esc)
    assert np.array_equal(got, pcm)

    from flacx.oracle import decode_stream
    *_, rows = decode_stream(io.BytesIO(stream_esc))
    assert np.array_equal(np.array(list(rows)), pcm)

    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from flac.decoder import decode as ref_decode
        *_, samples = ref_decode(io.BytesIO(stream_esc))
        assert np.array_equal(np.array(list(samples)), pcm)
    finally:
        sys.path.remove("/root/reference")


def test_device_escape_stream_parses_with_host_parsers(rng):
    """Both host-side frame parsers (native C++ and numpy lockstep) must
    walk escaped partitions; exercised via the sequential decoder too."""
    n = 1152
    pcm = _burst_pcm(rng, n, 30000, 32768, slice(0, 144))
    stream = _encode_stream(pcm, True, n)
    from flacx.decoder import decode_array
    _, got = decode_array(stream, batch_frames=1)
    assert np.array_equal(got, pcm)


def test_oracle_escape_emission_roundtrip(rng):
    from flacx.oracle.encoder import encode_frame
    from flacx.oracle.decoder import decode_stream

    n = 1152
    pcm = _burst_pcm(rng, n, 30000, 32768, slice(36, 36 + 72))
    planar = [list(map(int, pcm[:, c])) for c in range(2)]
    from flacx.format import INDEPENDENT_CHANNELS
    layout = INDEPENDENT_CHANNELS[2]
    params_esc = EncoderParameters(block_size=n, lpc_order=range(0, 9),
                                   use_escapes=True)
    params_ref = EncoderParameters(block_size=n, lpc_order=range(0, 9))
    f_esc = encode_frame(planar, layout, 0, 16, params_esc)
    f_ref = encode_frame(planar, layout, 0, 16, params_ref)
    assert len(f_esc) < len(f_ref)

    head = (MAGIC
            + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                        34)
            + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16, n,
                                              bytes(16))))
    *_, rows = decode_stream(io.BytesIO(head + f_esc))
    assert np.array_equal(np.array(list(rows)), pcm)

    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from flac.decoder import decode as ref_decode
        *_, samples = ref_decode(io.BytesIO(head + f_esc))
        assert np.array_equal(np.array(list(samples)), pcm)
    finally:
        sys.path.remove("/root/reference")


def test_cli_no_escapes_flag(tmp_path, rng):
    import wave

    from flacx.cli import main

    n = 1152
    # near-uniform high magnitudes (int16-valid): Rice k≈14 costs ~18.7
    # bits/sample, the 17-bit escape wins
    pcm = _burst_pcm(rng, 2 * n, 30000, 32767, slice(80, 80 + 72))
    wav = tmp_path / "in.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm.astype("<i2").tobytes())
    a, b = tmp_path / "esc.flac", tmp_path / "noesc.flac"
    common = ["-b", str(n), "-l", "8", "--batch-frames", "2"]
    main(["encode", str(wav), str(a)] + common)
    main(["encode", str(wav), str(b), "--no-escapes"] + common)
    assert a.stat().st_size < b.stat().st_size
    from flacx.decoder import decode_array
    for p in (a, b):
        _, got = decode_array(p.read_bytes())
        assert np.array_equal(got, pcm)
