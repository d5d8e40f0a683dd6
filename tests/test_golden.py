"""Golden byte-compat fixtures (generated once by the reference encoder).

These pin exact reference behavior without needing /root/reference at test
time: the oracle encoder must reproduce the bytes, and both decoders must
reproduce the PCM.
"""

import io
from pathlib import Path

import numpy as np
import pytest

from flacx.decoder import decode_array
from flacx.oracle import EncoderParameters, decode_stream, encode_stream

GOLDEN = Path(__file__).parent / "golden"
CASES = ["tonal_stereo_1152", "noise_stereo_1152"]


@pytest.mark.parametrize("name", CASES)
def test_oracle_reproduces_golden_bytes(name):
    pcm = np.load(GOLDEN / f"{name}.npy")
    want = (GOLDEN / f"{name}.flac").read_bytes()
    rows = (list(map(int, pcm[i])) for i in range(pcm.shape[0]))
    got = b"".join(encode_stream(44100, 16, 2, pcm.shape[0], rows,
                                 EncoderParameters(block_size=1152)))
    assert got == want


@pytest.mark.parametrize("name", CASES)
def test_decoders_reproduce_golden_pcm(name):
    pcm = np.load(GOLDEN / f"{name}.npy")
    data = (GOLDEN / f"{name}.flac").read_bytes()
    *_, rows = decode_stream(io.BytesIO(data))
    got = np.array([r for r in rows], dtype=np.int64)
    np.testing.assert_array_equal(got, pcm)
    si, got2 = decode_array(data, batch_frames=2)
    np.testing.assert_array_equal(got2, pcm)
