"""Kernel-vs-XLA equivalence for the Rice search statistics kernel.

``flacx.kernels.rice_tile.rice_stats_tiles`` must reproduce, bit for
bit, the per-level minima/argmins/maxima that ``exact_plan``'s own
int32 search arithmetic computes — the whole RicePlan (bits, chosen
order, per-segment parameters, escapes) must therefore be identical
with and without ``kernel_stats``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import flacx.ops  # noqa: F401  (x64)
from flacx.kernels.rice_tile import rice_stats_tiles, supported_levels
from flacx.ops import rice


def _mk_zz(rng, b, c, n, order):
    """Zigzag-like magnitudes over varied scales, incl. escape-class
    rows and all-zero rows, warmup positions zeroed."""
    scale = rng.choice([3, 40, 900, 1 << 14, 1 << 22, (1 << 30) - 1],
                       size=(b, c, 1))
    zz = (rng.random((b, c, n)) * scale).astype(np.int64)
    zz[rng.random((b, c, n)) < 0.05] = 0
    zz[: b // 8] = 0                        # constant/silence rows
    i = np.arange(n)
    zz[i[None, None, :] < order[..., None]] = 0
    return zz.astype(np.int32)


def _assert_plans_equal(pa, pb):
    for name in ("bits", "porder", "width", "k_seg", "esc_seg",
                 "k_param", "start_param", "esc_param"):
        a, b = np.asarray(getattr(pa, name)), np.asarray(getattr(pb, name))
        assert np.array_equal(a, b), name


@pytest.mark.parametrize("n,porders,kmax,c", [
    (4608, (0, 1, 2, 3, 4, 5), 23, 2),      # headline (whole-row kernel)
    (4608, (0, 1, 2, 3, 4, 5), 23, 4),      # exact-stereo virtual channels
    (1024, (0, 2, 4, 5, 6, 7), 14, 2),      # psize down to 8, small kmax
])
def test_whole_row_kernel_matches_plan(n, porders, kmax, c):
    rng = np.random.default_rng(n + c)
    b = 128
    assert supported_levels(n, porders, 512) is not None
    order = rng.integers(0, 13, size=(b, c)).astype(np.int32)
    zz = _mk_zz(rng, b, c, n, order)

    stats = rice_stats_tiles(jnp.asarray(zz), jnp.asarray(order),
                             porders, kmax, interpret=True)
    ref = rice.exact_plan(jnp.asarray(zz), jnp.asarray(order), porders,
                          porders, kmax)
    got = rice.exact_plan(jnp.asarray(zz), jnp.asarray(order), porders,
                          porders, kmax, kernel_stats=stats)
    _assert_plans_equal(got, ref)


def test_chunked_kernel_matches_plan():
    """Chunked grid: in-tile levels incl. psize 2/4 (offset-major
    extraction), cross-tile folds, and the closed form at psize 1."""
    rng = np.random.default_rng(7)
    b, c, n = 128, 2, 4096
    porders = tuple(range(13))              # psize 4096 .. 1 (closed)
    kmax = 30
    assert supported_levels(n, porders, 512) is not None
    order = rng.integers(0, 33, size=(b, c)).astype(np.int32)
    zz = _mk_zz(rng, b, c, n, order)

    stats = rice_stats_tiles(jnp.asarray(zz), jnp.asarray(order),
                             porders, kmax, interpret=True)
    ref = rice.exact_plan(jnp.asarray(zz), jnp.asarray(order), porders,
                          porders, kmax)
    got = rice.exact_plan(jnp.asarray(zz), jnp.asarray(order), porders,
                          porders, kmax, kernel_stats=stats)
    _assert_plans_equal(got, ref)


def test_supported_levels_gate():
    # 4608 at -r 7 yields psize 36 — neither 8-aligned nor 2/4
    assert supported_levels(4608, (0, 7), 512) is None
    # psize 2304 not a multiple of the 512 tile at chunked n
    assert supported_levels(9216, (0, 2), 512) is None
    # headline + hi-res bench configs are supported
    assert supported_levels(4608, (0, 1, 2, 3, 4, 5), 512) is not None
    assert supported_levels(16384, tuple(range(15)), 512) is not None
