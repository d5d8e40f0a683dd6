"""REAL multi-process distributed layer test (VERDICT round-2 #5).

Spawns 2 OS processes that form a genuine ``jax.distributed`` CPU cluster
on localhost (coordinator + worker), then asserts:

* ``init_distributed`` bootstraps both processes into one 2-device
  global topology,
* ``allreduce_stats`` really sums across process boundaries
  (``process_allgather`` over the distributed runtime, not the
  single-process identity path),
* ``encode_corpus_distributed`` stripes the corpus with no overlap, the
  union of stripes is the whole corpus, the all-reduced global stats
  match a single-process encode of everything, and every produced FLAC
  file decodes bit-exactly.

SURVEY.md §2.2 comm-backend row — previously proven only single-process.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import make_pcm

WORKER = Path(__file__).parent / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster(rng, tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    from flacx.wavio import write_wav

    pcms = {}
    for i, frames in enumerate([128 * 3 + 40, 128 * 2, 128 * 5 + 7]):
        pcm = make_pcm(rng, frames, 2, 16,
                       ["tonal", "noise", "impulse"][i])
        write_wav(wav_dir / f"in{i}.wav", 44100, 16, pcm)
        pcms[f"in{i}"] = pcm

    # minimal environment: the TPU plugin's env wiring (PYTHONPATH,
    # AXON_*/PALLAS_* vars) must not leak into the CPU cluster workers —
    # with it present, jax.distributed silently degrades to two separate
    # single-process clusters
    env = {k: os.environ[k] for k in ("PATH", "HOME", "TMPDIR", "LANG")
           if k in os.environ}
    env["JAX_PLATFORMS"] = "cpu"
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(port), str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    r0 = json.loads((tmp_path / "result0.json").read_text())
    r1 = json.loads((tmp_path / "result1.json").read_text())

    # disjoint stripes whose union is the corpus
    assert not (set(r0["mine"]) & set(r1["mine"]))
    assert sorted(r0["mine"] + r1["mine"]) == [f"in{i}.wav"
                                               for i in range(3)]
    assert not r0["failed"] and not r1["failed"]

    # both processes agree on the all-reduced global stats
    assert r0["global"] == r1["global"]
    assert r0["global"]["files"] == 3
    total_samples = sum(p.shape[0] for p in pcms.values())
    assert r0["global"]["samples"] == total_samples
    assert (r0["local_samples"] + r1["local_samples"]) == total_samples

    # the global stats match a single-process encode of everything
    from flacx.parallel.corpus import encode_corpus
    single = encode_corpus(sorted(wav_dir.glob("*.wav")),
                           tmp_path / "single", block_size=128,
                           max_lpc_order=4, qlp_precision=5,
                           partition_orders=(0, 1), batch_frames=4)
    assert r0["global"]["bytes_in"] == single.bytes_in
    assert r0["global"]["bytes_out"] == single.bytes_out

    # every produced file decodes bit-exactly (and matches the
    # single-process bytes)
    from flacx.decoder import decode_array
    for pid in (0, 1):
        for f in sorted((tmp_path / f"out{pid}").glob("*.flac")):
            _, got = decode_array(f.read_bytes())
            np.testing.assert_array_equal(got, pcms[f.stem])
            assert (f.read_bytes()
                    == (tmp_path / "single" / f.name).read_bytes())
