"""In-frame sequence parallelism (SP) via shard_map.

For very large block sizes (the codec's "long context": 16384/32768-sample
blocks, SURVEY.md §5), the sample axis itself can be sharded across chips.
Autocorrelation is the cross-sample coupling point: each shard computes
lag products over its local slice using a halo of ``max_lag`` samples
pulled from the next shard over ICI (``ppermute``), then partial sums
all-reduce over the sequence axis (``psum``).  This is the codec analogue
of ring-style long-context attention — communication is O(max_lag) per
shard regardless of block size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def autocorrelate_sharded(xw: jnp.ndarray, max_lag: int, mesh: Mesh,
                          seq_axis: str = "seq",
                          batch_axis: str | None = "frames") -> jnp.ndarray:
    """Autocorrelation over a sample-sharded array.

    Args:
      xw: ``[..., n]`` windowed samples (f32/f64), sharded on the last axis
        over ``seq_axis`` (and optionally on the first over ``batch_axis``).
      max_lag: lags ``0..max_lag`` are produced.
    Returns:
      ``[..., max_lag+1]`` f64, replicated over ``seq_axis`` — matching the
      unsharded :func:`flacx.ops.lpc.autocorrelate` summation range (the
      reference's, flac/encoder.py:443-450) up to float reduction order.
    """
    n = xw.shape[-1]
    nseq = mesh.shape[seq_axis]
    local = n // nseq

    lead_spec = (batch_axis,) + (None,) * (xw.ndim - 2)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(*lead_spec, seq_axis),
        out_specs=P(*lead_spec, None),
    )
    def _shard(x_local):
        s = jax.lax.axis_index(seq_axis)
        nshards = jax.lax.axis_size(seq_axis)
        # halo: first max_lag samples of the NEXT shard (zeros at the end)
        head = x_local[..., :max_lag]
        halo = jax.lax.ppermute(
            head, seq_axis,
            [(i, (i - 1) % nshards) for i in range(nshards)])
        halo = jnp.where(s == nshards - 1, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([x_local, halo], axis=-1)

        # global index of local position j is s*local + j; the reference
        # sum runs j_global <= n - lag - 2
        jg = s * local + jnp.arange(local)
        cols = []
        for lag in range(max_lag + 1):
            prod = ext[..., :local] * ext[..., lag: lag + local]
            mask = (jg <= n - lag - 2)
            cols.append(jnp.sum(prod * mask, axis=-1, dtype=jnp.float64))
        partial_sums = jnp.stack(cols, axis=-1)
        return jax.lax.psum(partial_sums, seq_axis)

    return _shard(xw)


def seq_mesh(n_data: int, n_seq: int) -> Mesh:
    """2-D mesh: frames (data-parallel) × seq (sample-axis sharding)."""
    import numpy as np
    devices = np.array(jax.devices()[: n_data * n_seq]
                       ).reshape(n_data, n_seq)
    return Mesh(devices, ("frames", "seq"))
