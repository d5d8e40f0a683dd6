"""Pallas kernel: CRC-16 GF(2) fold over pre-transposed packed words.

``flacx.ops.crcfold.crc16_over_word_rows`` is exact and fuses into one
XLA pass, but its 32 conditional-XOR steps re-count the whole word
array once per step in XLA's bytes-accessed accounting (~0.67 GB of the
headline batch's reported traffic) and it runs on the POST-transpose
``[B, words]`` layout.  This kernel folds the same linear form —
``crc = Σ_i byte_i · x^(8·d_i+16) mod P`` (see crcfold's module doc; the
reference walks a byte table serially, flac/crc.py:26-31) — directly on
the upper merge's ``[G, rows, lanes]`` output, one VMEM pass, with the
per-distance constants as a tiny host-built table.

The returned value is the UNFIXED fold over all ``rows·4`` byte
positions (trailing zeros included); the caller undoes the zero tail
with one inverse-power clmul per frame (``crcfold.inverse_power_table``)
— tiny ``[B]`` math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flacx.format import CRC16_POLYNOMIAL
from flacx.ops.crcfold import power_table

LANES = 128
RCHUNK = 512        # word rows folded per grid step (bounds VMEM)


def _crc_kernel(rchunk: int, nr: int, le: bool, w_ref, k4_ref, out_ref):
    j = pl.program_id(1)
    w = w_ref[0]                                 # [rchunk, L] u32
    prod = jnp.zeros_like(w)
    for b in range(4):
        kj = k4_ref[0, :, b: b + 1]              # [rchunk, 1] u32
        sh = 8 * b if le else 8 * (3 - b)
        for t in range(8):
            bit = (w >> (sh + t)) & jnp.uint32(1)
            prod = prod ^ ((kj << t) * bit)
    rows = rchunk
    while rows > 1:
        prod = prod[: rows // 2] ^ prod[rows // 2:]
        rows //= 2
    # accumulate the chunk partial across grid steps (sequential grid
    # revisits the same out block), Barrett-reduce on the last step
    acc = jnp.where(j == 0, jnp.uint32(0), out_ref[0, 0:1, :]) ^ prod
    total = acc                                   # [1, L], ≤ 23 bits
    for t in range(22, 15, -1):
        bit = (total >> t) & jnp.uint32(1)
        total = total ^ (jnp.uint32(CRC16_POLYNOMIAL << (t - 16)) * bit)
    out = jnp.where(j == nr - 1, total, acc)
    out_ref[0] = jnp.broadcast_to(out, (8, out.shape[-1]))


@functools.partial(jax.jit, static_argnames=("le", "interpret"))
def crc16_packed_t(packed: jnp.ndarray, le: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """Folded (length-unfixed) CRC-16 of each lane's word column.

    Args:
      packed: ``[G, rows, LANES]`` u32 — each lane a frame's packed
        words (``rows`` a multiple of 512), zero past the frame's byte
        length.
      le: byte order WITHIN each u32 — True when the merge kernels
        byteswapped for the little-endian byte split, False for
        MSB-first words.
    Returns:
      ``[G·LANES]`` uint32 — CRC-16 of the full ``rows·4``-byte column
      (caller applies the zero-tail inverse-power fix per true length).
    """
    g, r, l = packed.shape
    assert r % RCHUNK == 0
    nr = r // RCHUNK
    tab = power_table(16, CRC16_POLYNOMIAL, r * 4 + 1)
    k4 = np.zeros((r, 8), np.uint32)
    idx = np.arange(r * 4)
    k4[:, :4] = tab[r * 4 - 1 - idx].reshape(r, 4)
    out = pl.pallas_call(
        functools.partial(_crc_kernel, RCHUNK, nr, le),
        grid=(g, nr),
        in_specs=[
            pl.BlockSpec((1, RCHUNK, l), lambda i, j: (i, j, j - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RCHUNK, 8), lambda i, j: (i - i, j, j - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, l), lambda i, j: (i, j - j, j - j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 8, l), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed, jnp.asarray(k4.reshape(1, nr * RCHUNK, 8)))
    return out[:, 0, :].reshape(g * l)
