"""Sequence-parallel autocorrelation: halo exchange + psum vs unsharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flacx.ops  # noqa: F401
from flacx.ops.lpc import autocorrelate, tukey_window_np
from flacx.parallel.seqshard import autocorrelate_sharded, seq_mesh

from conftest import make_pcm


@pytest.mark.parametrize("n_data,n_seq", [(4, 2), (2, 4), (1, 8)])
def test_sharded_autocorr_matches(rng, n_data, n_seq):
    if len(jax.devices()) < n_data * n_seq:
        pytest.skip("needs 8 devices")
    n, lags = 1024, 8
    pcm = make_pcm(rng, n * 4, 1, 16, "tonal")[:, 0].reshape(4, n)
    w = tukey_window_np(n)
    xw = jnp.asarray(pcm * w)  # [4, n] f64

    want = autocorrelate(xw, lags)

    mesh = seq_mesh(n_data, n_seq)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xw_sharded = jax.device_put(xw, NamedSharding(mesh, P("frames", "seq")))
    got = jax.jit(
        lambda x: autocorrelate_sharded(x, lags, mesh))(xw_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-6)


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (1, 8)])
def test_sharded_fixed_sums_match_bit_exact(rng, n_data, n_seq):
    if len(jax.devices()) < n_data * n_seq:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flacx.ops.fixedpred import fixed_order_zz_sums
    from flacx.parallel.seqshard import fixed_order_zz_sums_sharded

    n = 1024
    pcm = make_pcm(rng, n * 4, 1, 16, "tonal")[:, 0].reshape(4, n)
    x = jnp.asarray(pcm.astype(np.int32))

    want = fixed_order_zz_sums(x, 16, use_tile_kernel=False)

    mesh = seq_mesh(n_data, n_seq)
    xs = jax.device_put(x, NamedSharding(mesh, P("frames", "seq")))
    got = jax.jit(
        lambda v: fixed_order_zz_sums_sharded(v, mesh))(xs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (1, 8)])
def test_sharded_lpc_stats_match_bit_exact(rng, n_data, n_seq):
    if len(jax.devices()) < n_data * n_seq:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flacx.ops.lpc import predict_residual_fused
    from flacx.parallel.seqshard import lpc_zz_stats_sharded

    n, t = 1024, 8
    pcm = make_pcm(rng, n * 4, 1, 16, "tonal")[:, 0].reshape(4, n)
    x = jnp.asarray(pcm.astype(np.int32))
    taps = jnp.asarray(rng.integers(-16, 16, size=(4, t)), jnp.int32)
    shift = jnp.asarray(rng.integers(0, 6, size=(4,)), jnp.int32)
    order = jnp.full((4,), t, jnp.int32)

    _, want_sum, want_max = predict_residual_fused(
        x, taps, shift, order, 17, t << 4, use_tile_kernel=False)

    mesh = seq_mesh(n_data, n_seq)
    xs = jax.device_put(x, NamedSharding(mesh, P("frames", "seq")))
    got_sum, got_max = jax.jit(
        lambda v, tp, sh, od: lpc_zz_stats_sharded(v, tp, sh, od, mesh)
    )(xs, taps, shift, order)
    np.testing.assert_array_equal(np.asarray(got_sum), np.asarray(want_sum))
    np.testing.assert_array_equal(
        np.asarray(got_max).astype(np.int64),
        np.asarray(want_max).astype(np.int64))
