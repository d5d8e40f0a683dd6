"""Pallas tile-merge kernel vs the BitWriter oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import flacx.ops  # noqa: F401
import jax
import jax.numpy as jnp

from flacx.bitio import BitWriter
from flacx.kernels.bitpack_tile import LANES, TILE, merge_tiles


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def test_merge_tiles_vs_bitwriter(rng):
    n_tiles = LANES  # one kernel instance
    lengths = rng.integers(0, 33, size=(n_tiles, TILE)).astype(np.int32)
    lengths[:, ::5] = 0
    lengths[0, :] = 0
    lengths[1, :4] = [32, 31, 1, 17]
    values = np.zeros((n_tiles, TILE), np.uint32)
    for i in range(n_tiles):
        for j in range(TILE):
            l = int(lengths[i, j])
            if l:
                values[i, j] = int(rng.integers(0, 1 << min(l, 31))) \
                    | ((l == 32) << 31)

    words, bits = merge_tiles(jnp.asarray(values), jnp.asarray(lengths),
                              interpret=_interpret())
    words, bits = np.asarray(words), np.asarray(bits)

    for i in range(0, n_tiles, 17):
        w = BitWriter()
        for j in range(TILE):
            w.write_uint(int(values[i, j]), int(lengths[i, j]))
        total = w.bit_length
        w.write_uint(0, (-total) % 32)
        want = np.frombuffer(w.getvalue(), np.uint8)
        want_words = (want[0::4].astype(np.uint32) << 24) \
            | (want[1::4].astype(np.uint32) << 16) \
            | (want[2::4].astype(np.uint32) << 8) | want[3::4]
        assert bits[i] == total
        nw = len(want_words)
        np.testing.assert_array_equal(words[i, :nw], want_words)
        assert not words[i, nw:].any()
