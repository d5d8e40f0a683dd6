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
