"""Multi-host (multi-process / DCN) scale-out.

The reference is a single thread on one core (SURVEY.md §2.2: no DP/TP/
PP, no communication backend).  flacx's frame independence makes the
codec embarrassingly parallel at every scale, so the multi-host design
has three deliberately thin layers:

1. **Process bootstrap** — :func:`init_distributed` wraps
   ``jax.distributed.initialize`` (the JAX-native replacement for the
   NCCL/MPI bootstrap a CUDA framework would carry): one coordinator,
   N processes, each owning its local TPU devices; afterwards
   ``jax.devices()`` spans every chip of every host and GSPMD collectives
   ride ICI within a slice and DCN across slices.

2. **Global mesh** — :func:`global_data_mesh` builds the process-spanning
   1-D ``frames`` mesh.  A ``pjit``-sharded encode batch over it is
   exactly the single-host path (``BatchEncoder(sharding=...)``); XLA
   inserts the cross-host collectives for the stats reductions.  Long
   single files scale this way: every host feeds its local shard of the
   frame batch (``jax.make_array_from_process_local_data``).

3. **Corpus partitioning** — :func:`shard_corpus`.  For many-file
   workloads no cross-host array need ever exist: files are striped
   deterministically across processes and each process runs the ordinary
   local corpus encoder on its stripe.  The only global communication is
   an optional scalar stats reduction (:func:`allreduce_stats`).

Only layer 3 plus the sharded-``pjit`` math of layer 2 are testable in
this repo (single process; the 8-virtual-device CPU mesh exercises the
sharding path end-to-end — see ``__graft_entry__.dryrun_multichip`` and
``tests/test_seqshard.py``).  Layer 1 is a documented entry point: it
must be called before any backend initialization, one call per process.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Sequence

import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids: Sequence[int] | None = None,
                     ) -> tuple[int, int]:
    """Join (or bootstrap) a multi-process JAX cluster.

    Call ONCE per process, before any JAX computation.  On TPU pods the
    arguments are inferred from the environment; on CPU/GPU clusters pass
    them explicitly.  Returns ``(process_index, process_count)``.
    """
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def global_data_mesh():
    """1-D ``frames`` mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("frames",))


def shard_corpus(paths: Iterable[Path | str],
                 process_index: int | None = None,
                 process_count: int | None = None) -> list[Path]:
    """Deterministic stripe of a corpus for this process.

    Sorted round-robin striping: every process computes the same global
    order and takes indices ``i ≡ process_index (mod process_count)``, so
    no coordination is needed and the union over processes is exactly the
    corpus.  Defaults to the live JAX process topology.
    """
    if process_index is None or process_count is None:
        import jax
        process_index = jax.process_index()
        process_count = jax.process_count()
    ordered = sorted(Path(p) for p in paths)
    return [p for i, p in enumerate(ordered)
            if i % process_count == process_index]


def encode_corpus_distributed(paths: Iterable[Path | str],
                              out_dir: Path | str, **encode_kwargs):
    """Corpus encode across every process of a multi-host cluster.

    Each process encodes its :func:`shard_corpus` stripe with the
    ordinary local corpus encoder (its own device mesh via
    ``encode_kwargs['sharding']`` if desired), then the scalar stats are
    summed over DCN.  Returns ``(local_result, global_stats)``.
    """
    import jax

    from flacx.parallel.corpus import encode_corpus

    mine = shard_corpus(paths)
    # one manifest shard per process: checkpoint/resume without any
    # cross-process write coordination (resume reads the shard union)
    encode_kwargs.setdefault(
        "manifest_suffix",
        f".p{jax.process_index()}" if jax.process_count() > 1 else "")
    result = encode_corpus(mine, out_dir, **encode_kwargs)
    totals = allreduce_stats({
        "files": len(result.encoded), "failed": len(result.failed),
        "samples": result.samples, "bytes_in": result.bytes_in,
        "bytes_out": result.bytes_out,
    })
    return result, totals


def allreduce_stats(values: dict[str, float | int]) -> dict[str, float]:
    """Global sum of scalar per-process stats (bytes in/out, samples,
    failures) over all processes — the codec's entire cross-host
    communication need.  Single-process: returns the inputs unchanged.
    """
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return {k: float(v) for k, v in values.items()}

    from jax.experimental.multihost_utils import process_allgather

    keys = sorted(values)
    local = np.array([float(values[k]) for k in keys])
    gathered = process_allgather(jnp.asarray(local))
    totals = np.asarray(gathered).sum(axis=0)
    return dict(zip(keys, totals.tolist()))
