"""Randomized differential + corruption fuzzing (VERDICT r3 item 6).

Two harnesses, both fully seeded and CI-sized:

* **Differential fuzz**: random PCM classes × a pool of encoder configs →
  flacx device-path bytes → decoded by (a) flacx's batched decoder,
  (b) flacx's strict oracle decoder, and (c) the upstream reference
  decoder (/root/reference, when present) — all three must return the
  original PCM exactly.  Config pool is static (each unique config is one
  XLA compile); randomness lives in the PCM and in which config each
  round draws.  The harness COUNTS the frames it fuzzed and asserts the
  total exceeds 1000 per run (round 5: the r4 docstring claimed ~1000
  while delivering ~130).

* **Corruption fuzz**: random bit flips, byte stomps, truncations and
  splices of valid streams must NEVER crash or hang either
  ``decode_array`` or ``decode_stream`` — every outcome is either a clean
  decode (the corruption missed the payload, e.g. padding) or a
  ``FlacFormatError``.  The reference decoder, by contrast, dies with
  bare asserts/EOFError on such input (flac/decoder.py:36,126,134).
"""

import io
import sys

import numpy as np
import pytest

from flacx.encoder import BatchEncoder, EncoderConfig
from flacx.format import MAGIC, MetadataBlockType, Streaminfo
from flacx.decoder import decode_array, decode_stream
from flacx.oracle import decode_stream as oracle_decode_stream
from flacx.oracle.decoder import FlacFormatError
from flacx.oracle.encoder import (serialize_metadata_header,
                                  serialize_streaminfo)

from conftest import make_pcm

#: static config pool — each entry is exactly one compiled device program
#: (block_size, max_lpc_order, bps, stereo, escapes)
CONFIG_POOL = (
    dict(block_size=256, max_lpc_order=8, bps=16),
    dict(block_size=512, max_lpc_order=12, bps=16, stereo="independent"),
    dict(block_size=384, max_lpc_order=4, bps=16, escapes=False),
    dict(block_size=256, max_lpc_order=6, bps=24),
    dict(block_size=256, max_lpc_order=8, bps=16,
         windows=("tukey(0.5)", "hann", "flattop")),
    # NB: a wasted-bits pool entry was tried in round 5 and reverted —
    # its extra in-suite encoder compile reproducibly crashed the
    # XLA:CPU compiler deep into full-suite runs (standalone runs were
    # green; segfault inside backend_compile_and_load, cumulative
    # compiler state).  The wasted-bits grammar keeps dedicated
    # encode/decode round-trip coverage in test_device_encoder.py.
)

PCM_KINDS = ("tonal", "noise", "impulse", "silence")


def _rand_pcm(rng: np.random.Generator, frames: int, bps: int) -> np.ndarray:
    """One random PCM block: a base class + random gain/DC/clip mutations."""
    kind = PCM_KINDS[int(rng.integers(len(PCM_KINDS)))]
    pcm = make_pcm(rng, frames, 2, bps, kind).astype(np.int64)
    amp = (1 << (bps - 1)) - 1
    mut = int(rng.integers(5))
    if mut == 1:                                    # hard clip
        pcm = np.clip(pcm * 3, -amp - 1, amp)
    elif mut == 2:                                  # DC offset + tiny gain
        pcm = np.clip(pcm // 2 + int(rng.integers(-amp // 2, amp // 2)),
                      -amp - 1, amp)
    elif mut == 3:                                  # random sparse spikes
        idx = rng.integers(0, frames, size=max(1, frames // 17))
        pcm[idx] = rng.integers(-amp - 1, amp + 1, size=(idx.size, 2))
    elif mut == 4:                                  # channel-correlated
        pcm[:, 1] = np.clip(pcm[:, 0]
                            + rng.integers(-3, 4, size=frames), -amp - 1, amp)
    return pcm.astype(np.int32)


def _encode(cfg: EncoderConfig, enc: BatchEncoder,
            pcm: np.ndarray) -> bytes:
    n = cfg.block_size
    f = pcm.shape[0] // n
    planar = pcm[: f * n].reshape(f, n, 2).transpose(0, 2, 1)
    frames = enc.encode_frames(np.ascontiguousarray(planar), 0)
    return (MAGIC
            + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                        34)
            + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2,
                                              cfg.bps, f * n, bytes(16)))
            + b"".join(frames))


@pytest.fixture(scope="module")
def encoders():
    pool = []
    for kw in CONFIG_POOL:
        cfg = EncoderConfig(**kw)
        pool.append((cfg, BatchEncoder(cfg, batch_frames=8)))
    return pool


def _reference_decode(data: bytes) -> np.ndarray | None:
    """Decode via the upstream reference decoder (None if unavailable)."""
    sys.path.insert(0, "/root/reference")
    try:
        from flac.decoder import decode as ref_decode  # type: ignore
    except Exception:
        return None
    finally:
        sys.path.remove("/root/reference")
        # pop the WHOLE flac package tree: leaving any submodule cached
        # while removing the parent breaks a later fresh `import
        # flac.encoder` (the cached child returns from sys.modules
        # without rebinding the attribute on the fresh parent)
        for _m in [k for k in sys.modules
                   if k == "flac" or k.startswith("flac.")]:
            sys.modules.pop(_m, None)
    *_, samples = ref_decode(io.BytesIO(data))
    return np.array([list(s) for s in samples], np.int64)


class DribbleIO(io.RawIOBase):
    """File object returning random short reads — fuzzes the streaming
    decoder's window refill/boundary logic."""

    def __init__(self, data: bytes, rng: np.random.Generator):
        self._b = io.BytesIO(data)
        self._rng = rng

    def readable(self):
        return True

    def read(self, size=-1):
        if size is None or size < 0:
            return self._b.read(size)
        cut = int(self._rng.integers(1, 97))
        return self._b.read(min(size, cut))


def test_differential_fuzz(encoders):
    """Random PCM × config pool: flacx bytes decode identically on every
    independent decoder (batched, strict oracle, upstream reference),
    with ``decode_stream`` additionally driven through randomly-sized
    short reads (window-boundary fuzz)."""
    rng = np.random.default_rng(0xFFACCED)
    ref_budget = 3        # reference decoder is ~0.4x realtime; sample it
    rounds = 96
    frames_fuzzed = 0
    for round_i in range(rounds):
        cfg, enc = encoders[int(rng.integers(len(encoders)))]
        nframes = int(rng.integers(6, 17))
        frames_fuzzed += nframes
        pcm = _rand_pcm(rng, nframes * cfg.block_size, cfg.bps)
        data = _encode(cfg, enc, pcm)

        si, got = decode_array(data, batch_frames=4)
        np.testing.assert_array_equal(got, pcm, err_msg=f"round {round_i}")

        # strict oracle cross-check on a sample of rounds
        if round_i % 12 == 0:
            *_, rows = oracle_decode_stream(io.BytesIO(data))
            oracle = np.array([r for r in rows], np.int64)
            np.testing.assert_array_equal(oracle, pcm)

        # streaming decode through dribbled short reads
        if round_i % 5 == 0:
            si2, chunks = decode_stream(DribbleIO(data, rng),
                                        batch_frames=4)
            got2 = np.concatenate([np.asarray(c) for c in chunks])
            np.testing.assert_array_equal(got2, pcm,
                                          err_msg=f"dribble {round_i}")

        # upstream reference decode on a budgeted sample
        if ref_budget > 0 and round_i % 12 == 0 and not cfg.wasted_bits:
            ref = _reference_decode(data)
            if ref is None:
                pytest.skip("/root/reference unavailable")
            np.testing.assert_array_equal(ref, pcm)
            ref_budget -= 1
    assert frames_fuzzed >= 1000, frames_fuzzed


def _check_clean(data: bytes) -> None:
    """Decode must finish cleanly or raise FlacFormatError — nothing else."""
    try:
        decode_array(data, batch_frames=4)
    except FlacFormatError:
        pass
    try:
        si, chunks = decode_stream(io.BytesIO(data), batch_frames=4)
        for _ in chunks:
            pass
    except FlacFormatError:
        pass


@pytest.mark.parametrize("pool_i", range(len(CONFIG_POOL)))
def test_corruption_fuzz_bitflips(encoders, pool_i):
    """Random single/multi bit flips anywhere in a valid stream — for
    EVERY grammar in the pool (round 5: r4 corrupted only
    CONFIG_POOL[0], leaving 24-bit, escape and multi-window streams
    un-corrupted)."""
    rng = np.random.default_rng(0xBADB17 + pool_i)
    cfg, enc = encoders[pool_i]
    pcm = _rand_pcm(rng, 4 * cfg.block_size, cfg.bps)
    base = bytearray(_encode(cfg, enc, pcm))
    for _ in range(120):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(len(data)))
            data[pos] ^= 1 << int(rng.integers(8))
        _check_clean(bytes(data))


def test_corruption_fuzz_variable_blocking():
    """Bit flips over a VARIABLE blocking-strategy stream (sample-number
    coded numbers, mixed block sizes)."""
    from flacx.oracle.encoder import EncoderParameters, \
        encode_stream_variable

    rng = np.random.default_rng(0x5AB1E)
    sizes = [512, 512, 512, 384, 256]
    total = sum(sizes)
    t = np.arange(total)
    pcm = np.stack([(6000 * np.sin(0.031 * t)).astype(np.int64),
                    (6000 * np.sin(0.027 * t + 1)).astype(np.int64)], 1)
    params = EncoderParameters()
    base = b"".join(encode_stream_variable(
        44100, 16, 2, pcm.tolist(), params, sizes))
    for _ in range(120):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(len(data)))
            data[pos] ^= 1 << int(rng.integers(8))
        _check_clean(bytes(data))


def test_corruption_fuzz_truncation_and_splice(encoders):
    """Truncations, random-tail splices, header stomps, garbage prefixes."""
    rng = np.random.default_rng(0x7256CA7)
    cfg, enc = encoders[0]
    pcm = _rand_pcm(rng, 3 * cfg.block_size, cfg.bps)
    base = _encode(cfg, enc, pcm)
    for i in range(120):
        mode = i % 4
        if mode == 0:                                   # truncate anywhere
            cut = int(rng.integers(1, len(base)))
            data = base[:cut]
        elif mode == 1:                                 # splice random tail
            cut = int(rng.integers(4, len(base)))
            tail = rng.integers(0, 256,
                                size=int(rng.integers(1, 64))).astype(np.uint8)
            data = base[:cut] + tail.tobytes()
        elif mode == 2:                                 # stomp a byte run
            data = bytearray(base)
            pos = int(rng.integers(len(data) - 8))
            ln = int(rng.integers(1, 8))
            data[pos: pos + ln] = bytes([int(rng.integers(256))] * ln)
            data = bytes(data)
        else:                                           # garbage between frames
            pos = int(rng.integers(len(base)))
            mid = rng.integers(0, 256,
                               size=int(rng.integers(1, 16))).astype(np.uint8)
            data = base[:pos] + mid.tobytes() + base[pos:]
        _check_clean(data)


def test_corruption_fuzz_pure_garbage():
    """Streams that are not FLAC at all (incl. magic-prefixed garbage)."""
    rng = np.random.default_rng(0x6A2BA6E)
    for i in range(60):
        body = rng.integers(0, 256,
                            size=int(rng.integers(0, 256))).astype(np.uint8)
        data = body.tobytes()
        if i % 2:
            data = MAGIC + data
        _check_clean(data)


def test_scan_ambiguity_fake_sync_candidates():
    """Duplicate-coded-number ambiguity for the boundary-scan resolver:
    a real frame header (valid sync + CRC-8, DUPLICATE frame number) is
    embedded byte-for-byte inside a later frame's verbatim payload —
    full-scale noise makes every subframe verbatim, whose 16-bit
    samples are byte-aligned, so arbitrary bytes can be planted.  The
    scan must report the fake as a candidate (asserted) and the chain
    resolver must still pick the true boundaries and decode exactly."""
    from flacx.native import scan_candidates

    cfg = EncoderConfig(block_size=256, max_lpc_order=4,
                        stereo="independent")
    enc = BatchEncoder(cfg, batch_frames=8)
    n = cfg.block_size
    rng = np.random.default_rng(0xA3B)
    nframes = 24
    pcm = rng.integers(-(1 << 15), 1 << 15,
                       size=(nframes * n, 2)).astype(np.int32)

    # first pass: grab frame 2's header bytes (incl. its CRC-8)
    planar = pcm.reshape(nframes, n, 2).transpose(0, 2, 1)
    frames = enc.encode_frames(np.ascontiguousarray(planar), 0)
    fake = bytes(frames[2][:6])          # FF F8 bs/rate ch/size num crc8
    assert fake[0] == 0xFF

    # embed it in frame 10, channel 0, samples 8..10 (verbatim payload
    # is big-endian 16-bit at byte offset 7 of the frame)
    vals = np.frombuffer(fake, np.uint8).reshape(3, 2)
    samp = (vals[:, 0].astype(np.int32) << 8) | vals[:, 1]
    samp = np.where(samp >= 1 << 15, samp - (1 << 16), samp)
    pcm2 = pcm.copy()
    pcm2[10 * n + 8: 10 * n + 11, 0] = samp
    data = _encode(cfg, enc, pcm2)
    assert fake in data[len(data) // 3:]       # planted in a later frame

    cand = scan_candidates(np.frombuffer(data, np.uint8), 0)
    assert cand is not None and len(cand[0]) > nframes, \
        "fake candidate not seen by the scan"
    si, got = decode_array(data, batch_frames=8)
    np.testing.assert_array_equal(got, pcm2)
    *_, rows = oracle_decode_stream(io.BytesIO(data))
    oracle = np.array([r for r in rows], np.int64)
    np.testing.assert_array_equal(oracle, pcm2)
