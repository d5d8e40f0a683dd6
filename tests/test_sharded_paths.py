"""Sharded encode/decode/corpus on the 8-virtual-device CPU mesh.

The conftest forces ``--xla_force_host_platform_device_count=8``, so these
run the REAL GSPMD partitioner end-to-end (the codec analogue of
multi-node tests without a cluster, SURVEY.md §4).
"""

import io
import wave

import numpy as np

from conftest import make_pcm
from flacx.parallel import data_mesh, frame_sharding


def _mesh8():
    return frame_sharding(data_mesh(8))


def test_sharded_encode_matches_unsharded(rng):
    from flacx import pipeline

    pcm = make_pcm(rng, 256 * 16 + 50, 2, 16, kind="tonal")
    kw = dict(sample_rate=44100, bps=16, channels=2, block_size=256,
              max_lpc_order=6, qlp_precision=5, partition_orders=(0, 1, 2),
              batch_frames=8)
    a, b = io.BytesIO(), io.BytesIO()
    pipeline.encode_to_file(a, pcm, sharding=_mesh8(), **kw)
    pipeline.encode_to_file(b, pcm, **kw)
    assert a.getvalue() == b.getvalue()


def test_sharded_decode_bit_exact(rng):
    from flacx import pipeline
    from flacx.decoder import decode_array

    pcm = make_pcm(rng, 256 * 16, 2, 16, kind="noise")
    kw = dict(sample_rate=44100, bps=16, channels=2, block_size=256,
              max_lpc_order=6, qlp_precision=5, partition_orders=(0, 1, 2),
              batch_frames=8)
    buf = io.BytesIO()
    pipeline.encode_to_file(buf, pcm, **kw)
    # batch divides the mesh → sharded device decode
    _, got = decode_array(buf.getvalue(), batch_frames=8, sharding=_mesh8())
    assert np.array_equal(got, pcm)
    # batch NOT dividing the mesh (16 frames in batches of 6 → last is 4)
    _, got2 = decode_array(buf.getvalue(), batch_frames=6,
                           sharding=_mesh8())
    assert np.array_equal(got2, pcm)


def test_sharded_corpus_encode(tmp_path, rng):
    """VERDICT item 9: corpus mode under sharding=frame_sharding(
    data_mesh(8)) in CI, every output bit-exact."""
    from flacx.decoder import decode_array
    from flacx.parallel.corpus import encode_corpus
    from flacx.wavio import read_wav

    paths = []
    for i in range(3):
        pcm = make_pcm(rng, 900 + 300 * i, 2, 16,
                       kind=("tonal", "noise", "impulse")[i])
        p = tmp_path / f"c{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(pcm.astype("<i2").tobytes())
        paths.append(p)
    out = tmp_path / "out"
    result = encode_corpus(paths, out, block_size=256, max_lpc_order=4,
                           partition_orders=(0, 1), batch_frames=8,
                           sharding=_mesh8())
    assert len(result.encoded) == 3 and not result.failed
    for p in paths:
        _, _, _, want = read_wav(p)
        _, got = decode_array((out / (p.stem + ".flac")).read_bytes())
        assert np.array_equal(got, want)
