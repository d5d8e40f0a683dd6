"""CLI surface parity with the reference (flac/__main__.py:114-194)."""

import numpy as np
import pytest

from flacx.cli import make_argument_parser
from flacx.wavio import pcm_to_le_bytes, read_wav, write_wav


def test_reference_flags_and_defaults():
    p = make_argument_parser()
    args = p.parse_args(["encode", "in.wav", "out.flac"])
    assert args.block_size == 4608          # reference DEFAULT_BLOCK_SIZE
    assert args.max_lpc_order == 12         # DEFAULT_MAX_LPC_ORDER
    assert args.qlp_coeff_precision == 5    # DEFAULT_QLP_COEFF_PRECISION
    assert args.rice_partition_order == "5" or \
        args.rice_partition_order == range(0, 6)

    args = p.parse_args(["encode", "a.wav", "b.flac",
                         "-b", "1152", "-l", "8", "-q", "6", "-r", "2,4"])
    assert (args.block_size, args.max_lpc_order,
            args.qlp_coeff_precision) == (1152, 8, 6)
    assert args.rice_partition_order == range(2, 5)

    args = p.parse_args(["decode", "in.flac", "out.wav"])
    assert args.action == "decode"


def test_subcommand_required():
    p = make_argument_parser()
    with pytest.raises(SystemExit):
        p.parse_args([])


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_wav_roundtrip(tmp_path, rng, bps):
    amp = (1 << (bps - 1)) - 1
    pcm = rng.integers(-amp - 1, amp, size=(777, 2)).astype(np.int32)
    path = tmp_path / "x.wav"
    write_wav(path, 48000, bps, pcm)
    sr, bps2, ch, got = read_wav(path)
    assert (sr, bps2, ch) == (48000, bps, 2)
    np.testing.assert_array_equal(got, pcm)


def test_pcm_to_le_bytes_24bit(rng):
    pcm = rng.integers(-(1 << 23), 1 << 23, size=(64, 2)).astype(np.int32)
    raw = pcm_to_le_bytes(pcm, 24)
    flat = pcm.reshape(-1)
    for i in (0, 5, 127):
        want = int(flat[i]) & 0xFFFFFF
        got = raw[3 * i] | (raw[3 * i + 1] << 8) | (raw[3 * i + 2] << 16)
        assert got == want
