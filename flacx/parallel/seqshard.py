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


def _halo_prev(x_local: jnp.ndarray, width: int,
               seq_axis: str) -> jnp.ndarray:
    """Last ``width`` samples of the PREVIOUS shard (zeros for shard 0) —
    the lookbehind halo predictors need (communication O(width) over ICI,
    independent of block size)."""
    s = jax.lax.axis_index(seq_axis)
    nsh = jax.lax.axis_size(seq_axis)
    tail = x_local[..., -width:]
    halo = jax.lax.ppermute(
        tail, seq_axis, [(i, (i + 1) % nsh) for i in range(nsh)])
    return jnp.where(s == 0, jnp.zeros_like(halo), halo)


def fixed_order_zz_sums_sharded(x: jnp.ndarray, mesh: Mesh,
                                seq_axis: str = "seq",
                                batch_axis: str | None = "frames"
                                ) -> jnp.ndarray:
    """Sample-sharded exact zigzag sums of all five fixed-order residuals.

    Bit-identical to :func:`flacx.ops.fixedpred.fixed_order_zz_sums`
    (integer adds are associative — no float reduction-order caveat):
    each shard pulls a 4-sample lookbehind halo (``ppermute``), runs the
    fused difference chain locally, and the per-order sums ``psum`` over
    the sequence axis.  Shard 0's zero halo reproduces the unsharded
    zero padding at global positions < 0.
    """
    from flacx.ops.fixedpred import shift_right_one
    from flacx.ops.rice import zigzag

    n = x.shape[-1]
    local = n // mesh.shape[seq_axis]
    lead_spec = (batch_axis,) + (None,) * (x.ndim - 2)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(*lead_spec, seq_axis),
        out_specs=P(*lead_spec, None),
    )
    def _shard(xl):
        s = jax.lax.axis_index(seq_axis)
        ext = jnp.concatenate([_halo_prev(xl, 4, seq_axis), xl], axis=-1)
        jg = s * local + jnp.arange(local)
        cols = []
        cur = ext
        for o in range(5):
            if o:
                cur = cur - shift_right_one(cur)
            cols.append(jnp.sum(zigzag(cur[..., 4:]) * (jg >= o),
                                axis=-1, dtype=jnp.int64))
        return jax.lax.psum(jnp.stack(cols, axis=-1), seq_axis)

    return _shard(x)


def lpc_zz_stats_sharded(x: jnp.ndarray, taps: jnp.ndarray,
                         shift: jnp.ndarray, order: jnp.ndarray,
                         mesh: Mesh, seq_axis: str = "seq",
                         batch_axis: str | None = "frames"
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample-sharded LPC residual selection statistics.

    Returns ``(zz_sum [...], maxabs [...])`` — the zigzag magnitude sum
    and max |residual| of ``res[i] = x[i] − (Σ_j taps_j·x[i−1−j] >> shift)``
    masked to ``i ≥ order``, bit-identical to the unsharded
    :func:`flacx.ops.lpc.predict_residual_fused` statistics (int64 MAC;
    reference ranking basis flac/encoder.py:374-390).  Each shard pulls a
    ``t``-sample lookbehind halo; sums ``psum`` and the max ``pmax`` over
    the sequence axis.
    """
    t = taps.shape[-1]
    n = x.shape[-1]
    local = n // mesh.shape[seq_axis]
    lead_spec = (batch_axis,) + (None,) * (x.ndim - 2)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(*lead_spec, seq_axis), P(*lead_spec, None),
                  P(*lead_spec), P(*lead_spec)),
        out_specs=(P(*lead_spec), P(*lead_spec)),
    )
    def _shard(xl, tp, sh, od):
        s = jax.lax.axis_index(seq_axis)
        ext = jnp.concatenate([_halo_prev(xl, t, seq_axis), xl],
                              axis=-1).astype(jnp.int64)
        acc = jnp.zeros(xl.shape, jnp.int64)
        for j in range(t):
            acc = acc + (ext[..., t - 1 - j: t - 1 - j + local]
                         * tp[..., j: j + 1].astype(jnp.int64))
        pred = acc >> sh[..., None].astype(jnp.int64)
        res = xl.astype(jnp.int64) - pred
        jg = s * local + jnp.arange(local)
        m = jg >= od[..., None]
        zz = ((res << 1) ^ (res >> 63)) * m
        zz_sum = jax.lax.psum(jnp.sum(zz, axis=-1), seq_axis)
        maxabs = jax.lax.pmax(jnp.max(jnp.abs(res) * m, axis=-1), seq_axis)
        return zz_sum, maxabs

    return _shard(x, taps, shift, order)


def seq_mesh(n_data: int, n_seq: int) -> Mesh:
    """2-D mesh: frames (data-parallel) × seq (sample-axis sharding)."""
    import numpy as np
    devices = np.array(jax.devices()[: n_data * n_seq]
                       ).reshape(n_data, n_seq)
    return Mesh(devices, ("frames", "seq"))
