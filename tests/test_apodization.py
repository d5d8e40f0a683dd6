"""Multi-window LPC apodization (the libFLAC ``-A`` lever).

The reference hardcodes Tukey(0.5) (flac/encoder.py:423-440); flacx
accepts a window list and keeps, per (frame, channel, order), the window
whose quantized predictor ranks best — see
``flacx.ops.lpc.apodization_window_np`` and ``EncoderConfig.windows``.
"""

import io

import numpy as np
import pytest

from flacx.ops.lpc import apodization_window_np, tukey_window_np


def test_window_library_shapes_and_identities():
    n = 256
    for name in ("tukey(0.5)", "tukey(0.2)", "hann", "rectangle",
                 "triangle", "welch", "blackman", "nuttall", "flattop",
                 "gauss(0.25)"):
        w = apodization_window_np(name, n)
        assert w.shape == (n,) and w.dtype == np.float64
    assert np.array_equal(apodization_window_np("rectangle", n),
                          np.ones(n))
    assert np.allclose(apodization_window_np("tukey(0.5)", n),
                       tukey_window_np(n))
    assert np.allclose(apodization_window_np("tukey", n),
                       tukey_window_np(n))
    # hann peaks mid-window, near-zero at the edges (libFLAC over N-1)
    h = apodization_window_np("hann", n)
    assert h[0] == 0.0 and abs(h[-1]) < 1e-12 and h[n // 2] > 0.99


def test_window_validation_errors():
    with pytest.raises(ValueError):
        apodization_window_np("nosuch", 64)
    with pytest.raises(ValueError):
        apodization_window_np("hann(0.3)", 64)     # no parameter
    with pytest.raises(ValueError):
        apodization_window_np("gauss(0.9)", 64)    # stddev out of range
    from flacx.encoder import EncoderConfig
    with pytest.raises(ValueError):
        EncoderConfig(windows=("tukey(0.5)", "bogus"))
    with pytest.raises(ValueError):
        EncoderConfig(windows=())


def _chirp_pcm(rng, total):
    t = np.arange(total)
    sig = (12000 * np.sin(2 * np.pi * 0.013 * t
                          + 3 * np.sin(2 * np.pi * 0.0003 * t))
           + 100 * rng.standard_normal(total))
    pcm = np.stack([sig, 0.8 * sig + 50 * rng.standard_normal(total)], 1)
    return np.clip(pcm, -32768, 32767).astype(np.int32)


@pytest.mark.parametrize("order_search", ["estimate", "exact"])
def test_multi_window_roundtrip_bit_exact(order_search):
    from flacx import pipeline
    from flacx.decoder import decode_array

    rng = np.random.default_rng(42)
    n, frames = 512, 8
    pcm = _chirp_pcm(rng, n * frames)
    kw = dict(sample_rate=44100, bps=16, channels=2, block_size=n,
              max_lpc_order=8, qlp_precision=5,
              partition_orders=(0, 1, 2, 3), batch_frames=4,
              order_search=order_search)
    buf = io.BytesIO()
    pipeline.encode_to_file(
        buf, pcm,
        windows=("tukey(0.5)", "hann", "flattop", "gauss(0.2)"), **kw)
    _, got = decode_array(buf.getvalue(), batch_frames=4)
    np.testing.assert_array_equal(got, pcm)


def test_multi_window_exact_never_larger_on_chirp():
    """With exact per-order ranking, adding window candidates can only
    improve the predicted-residual choice on this seeded signal."""
    from flacx import pipeline

    rng = np.random.default_rng(42)
    n, frames = 512, 8
    pcm = _chirp_pcm(rng, n * frames)
    kw = dict(sample_rate=44100, bps=16, channels=2, block_size=n,
              max_lpc_order=8, qlp_precision=5,
              partition_orders=(0, 1, 2, 3), batch_frames=4,
              order_search="exact")
    b1, b2 = io.BytesIO(), io.BytesIO()
    pipeline.encode_to_file(b1, pcm, **kw)
    pipeline.encode_to_file(
        b2, pcm,
        windows=("tukey(0.5)", "hann", "flattop", "gauss(0.2)"), **kw)
    assert len(b2.getvalue()) <= len(b1.getvalue())


def test_single_window_unchanged_bytes():
    """windows=("tukey(0.5)",) must be byte-identical to the historical
    single-window pipeline (the default path is untouched)."""
    from flacx import pipeline

    rng = np.random.default_rng(7)
    n, frames = 256, 4
    pcm = _chirp_pcm(rng, n * frames)
    kw = dict(sample_rate=44100, bps=16, channels=2, block_size=n,
              max_lpc_order=6, qlp_precision=5, partition_orders=(0, 1),
              batch_frames=4)
    b1, b2 = io.BytesIO(), io.BytesIO()
    pipeline.encode_to_file(b1, pcm, **kw)
    pipeline.encode_to_file(b2, pcm, windows=("tukey(0.5)",), **kw)
    assert b1.getvalue() == b2.getvalue()


def test_cli_apodization_flag(tmp_path):
    from flacx.cli import main
    from flacx.wavio import write_wav

    rng = np.random.default_rng(3)
    pcm = _chirp_pcm(rng, 2048)
    wav_in = tmp_path / "in.wav"
    flac_out = tmp_path / "out.flac"
    wav_out = tmp_path / "rt.wav"
    write_wav(wav_in, 44100, 16, pcm)
    main(["encode", str(wav_in), str(flac_out), "-b", "512",
          "-A", "tukey(0.5);hann", "--batch-frames", "4"])
    main(["decode", str(flac_out), str(wav_out)])
    from flacx.wavio import read_wav
    *_, got = read_wav(wav_out)
    np.testing.assert_array_equal(got, pcm)
