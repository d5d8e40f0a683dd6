"""Worker process for the real multi-process distributed test.

Launched (twice) by ``test_distributed_multiproc.py`` with a shared
coordinator port.  Each process joins the 2-process JAX CPU cluster via
``flacx.parallel.init_distributed`` (the jax.distributed bootstrap that
replaces a CUDA framework's NCCL/MPI init), checks the cross-process
collectives (``allreduce_stats`` rides ``process_allgather``), runs the
striped corpus encoder, and writes its results as JSON for the parent to
verify.

Usage: python _mp_worker.py <port> <process_id> <workdir>
"""

import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)  # see conftest.py: CPU AOT cache unsafe on migrating VMs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    port, pid, workdir = int(sys.argv[1]), int(sys.argv[2]), Path(sys.argv[3])

    from flacx.parallel.distributed import (allreduce_stats,
                                            encode_corpus_distributed,
                                            global_data_mesh,
                                            init_distributed, shard_corpus)

    index, count = init_distributed(f"localhost:{port}", num_processes=2,
                                    process_id=pid)
    assert (index, count) == (pid, 2), (index, count)

    import jax
    assert len(jax.devices()) == 2          # one CPU device per process
    mesh = global_data_mesh()
    assert mesh.devices.size == 2

    # cross-process scalar all-reduce: sum over both processes
    totals = allreduce_stats({"x": pid + 1, "y": 10})
    assert totals == {"x": 3.0, "y": 20.0}, totals

    wavs = sorted((workdir / "wavs").glob("*.wav"))
    mine = shard_corpus(wavs)
    result, gstats = encode_corpus_distributed(
        wavs, workdir / f"out{pid}", block_size=128, max_lpc_order=4,
        qlp_precision=5, partition_orders=(0, 1), batch_frames=4)

    (workdir / f"result{pid}.json").write_text(json.dumps({
        "mine": [p.name for p in mine],
        "encoded": sorted(p.name for p in result.encoded),
        "failed": result.failed,
        "local_samples": result.samples,
        "global": gstats,
    }))


if __name__ == "__main__":
    main()
