"""Multi-host scale-out layer (single-process testable parts).

The process-spanning pieces (jax.distributed.initialize, DCN collectives)
need a real multi-process cluster; what IS testable here is everything
the design actually relies on: deterministic disjoint corpus striping,
the stats reduction's single-process identity, and the distributed corpus
driver end-to-end in a 1-process world (plus the sharded pjit math, which
tests/test_seqshard.py and __graft_entry__.dryrun_multichip cover on the
8-virtual-device CPU mesh).
"""

import wave

import numpy as np

from conftest import make_pcm
from flacx.parallel.distributed import (allreduce_stats,
                                        encode_corpus_distributed,
                                        shard_corpus)


def test_shard_corpus_partitions_exactly():
    names = [f"dir{i % 3}/f{i:02d}.wav" for i in range(13)]
    stripes = [shard_corpus(names, p, 4) for p in range(4)]
    flat = [str(p) for s in stripes for p in s]
    assert sorted(flat) == sorted(names)
    seen = set()
    for s in stripes:
        ss = set(map(str, s))
        assert not ss & seen
        seen |= ss
    # deterministic: same stripe regardless of input order
    rev = shard_corpus(list(reversed(names)), 2, 4)
    assert [str(p) for p in rev] == [str(p) for p in stripes[2]]


def test_allreduce_stats_single_process():
    got = allreduce_stats({"bytes_out": 10, "samples": 5.5})
    assert got == {"bytes_out": 10.0, "samples": 5.5}


def test_encode_corpus_distributed_single_process(tmp_path, rng):
    paths = []
    for i in range(3):
        pcm = make_pcm(rng, 700 + 128 * i, 2, 16, kind="tonal")
        p = tmp_path / f"in{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(pcm.astype("<i2").tobytes())
        paths.append(p)
    out = tmp_path / "out"
    result, totals = encode_corpus_distributed(
        paths, out, block_size=256, max_lpc_order=4,
        partition_orders=(0, 1), batch_frames=4)
    assert len(result.encoded) == 3 and not result.failed
    assert totals["files"] == 3.0
    assert totals["bytes_out"] == float(result.bytes_out) > 0
    # every output decodes bit-exactly
    from flacx.decoder import decode_array
    from flacx.wavio import read_wav
    for p in paths:
        _, _, _, want = read_wav(p)
        _, got = decode_array((out / (p.stem + ".flac")).read_bytes())
        assert np.array_equal(got, want)
