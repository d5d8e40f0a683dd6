"""Multi-chip scale-out via jax.sharding.

The codec is embarrassingly parallel over frames (each FLAC frame is fully
self-contained, SURVEY.md §2.2), so the primary layout is a 1-D ``frames``
mesh with batches sharded on the leading axis; XLA inserts the only needed
collective (an all-reduce for aggregate statistics).  Corpus-scale encode
shards file-buckets the same way.
"""

from flacx.parallel.mesh import data_mesh, frame_sharding

__all__ = ["data_mesh", "frame_sharding", "init_distributed",
           "global_data_mesh", "shard_corpus", "allreduce_stats",
           "encode_corpus_distributed"]


def __getattr__(name):
    # lazy: flacx.parallel.distributed pulls in corpus/encoder machinery
    if name in ("init_distributed", "global_data_mesh", "shard_corpus",
                "allreduce_stats", "encode_corpus_distributed"):
        from flacx.parallel import distributed
        return getattr(distributed, name)
    raise AttributeError(name)
