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


def test_merge_strings_full_packer_vs_xla_tree(rng):
    """Two-stage Pallas packer (tile merge + in-VMEM upper merge) must
    reproduce the XLA merge tree bit-for-bit."""
    from flacx.kernels.bitpack_tile import merge_strings
    from flacx.ops.bitpack import pack_symbols

    f, slots = 8, 16 * TILE                  # 16 strings per frame
    lengths = rng.integers(0, 33, size=(f, slots)).astype(np.int32)
    lengths[:, ::7] = 0
    lengths[2, TILE:3 * TILE] = 0            # an empty middle string
    values = (rng.integers(0, 1 << 31, size=(f, slots)).astype(np.uint32)
              & ((np.uint32(1) << np.minimum(lengths, 31)) - 1)
              .astype(np.uint32))
    values = np.where(lengths == 32,
                      values | np.uint32(1 << 31), values).astype(np.uint32)
    max_bytes = slots * 4

    tw, tb = merge_tiles(jnp.asarray(values.reshape(-1, TILE)),
                         jnp.asarray(lengths.reshape(-1, TILE)),
                         interpret=_interpret())
    packed = merge_strings(jnp.asarray(tw).reshape(f, 16, TILE),
                           jnp.asarray(tb).reshape(f, 16),
                           interpret=_interpret(), lanes=f)
    got_words = np.asarray(packed)
    got_bits = np.asarray(tb).reshape(f, 16).sum(-1)

    want_bytes, want_bits = pack_symbols(
        jnp.asarray(values), jnp.asarray(lengths), max_bytes,
        use_tile_kernel=False)
    want_bytes = np.asarray(want_bytes)
    np.testing.assert_array_equal(got_bits, np.asarray(want_bits))
    got_bytes = np.stack([got_words >> 24, got_words >> 16,
                          got_words >> 8, got_words],
                         axis=-1).astype(np.uint8).reshape(f, -1)
    np.testing.assert_array_equal(got_bytes, want_bytes)


# ---------------------------------------------------------------------------
# Single-pass autocorrelation kernel vs the per-lag XLA formulation


@pytest.mark.parametrize("r, n, max_lag", [
    (128, 700, 12),      # ragged tile boundary, two tiles
    (128, 512, 32),      # exactly one tile, hi-res lag count
    (256, 4608, 12),     # flagship block size, nine tiles
    (128, 3, 2),         # shorter than one tile
])
def test_autocorr_tiled_matches_xla(rng, r, n, max_lag):
    from flacx.kernels.autocorr_tile import autocorr_tiled
    from flacx.ops.lpc import autocorrelate

    w = jnp.asarray((rng.standard_normal((r, n)) * 1000).astype(np.float32))
    want = np.asarray(autocorrelate(w, max_lag, use_tile_kernel=False))
    v = w.at[:, n - 1].set(0.0)
    got = np.asarray(autocorr_tiled(v, max_lag, interpret=_interpret()))
    np.testing.assert_allclose(got, want, rtol=2e-6,
                               atol=np.abs(want).max() * 2e-7)


def test_autocorrelate_kernel_gate(rng):
    """The auto gate routes f32 TPU-shaped inputs through the kernel and
    leaves f64 (exact-mode) inputs on the per-lag XLA path; both agree."""
    from flacx.ops.lpc import autocorrelate

    w = jnp.asarray((rng.standard_normal((2, 4, 600)) * 500)
                    .astype(np.float32))
    via_kernel = np.asarray(autocorrelate(w, 8, use_tile_kernel=True)) \
        if _interpret() is False else None  # kernel needs TPU off-interpret
    plain = np.asarray(autocorrelate(w, 8, use_tile_kernel=False))
    assert plain.shape == (2, 4, 9) and plain.dtype == np.float64
    if via_kernel is not None:
        np.testing.assert_allclose(via_kernel, plain, rtol=2e-6)


# ---------------------------------------------------------------------------
# Single-pass fixed-order zigzag-sum kernel vs the XLA diff chain


@pytest.mark.parametrize("r, n", [
    (128, 4608),         # flagship block, nine tiles
    (128, 531),          # ragged tail tile + warmup/padding masks
    (256, 512),          # exactly one tile
    (128, 5),            # shorter than one tile, all-warmup orders
])
def test_fixed_order_sums_kernel_matches_chain(rng, r, n):
    from flacx.kernels.zzsum_tile import fixed_order_sums
    from flacx.ops.fixedpred import fixed_order_zz_sums

    # eff_bps = 17 extremes: the int32 tile partials must stay exact at
    # the gate boundary (zz(Δ⁴) ≤ 2^21, 512-term partial ≤ 2^30)
    x = rng.integers(-(1 << 16), 1 << 16, size=(r, n)).astype(np.int32)
    x[0, :] = (1 << 16) - 1
    x[1, :: 2] = -(1 << 16)
    want = np.asarray(fixed_order_zz_sums(jnp.asarray(x), 17,
                                          use_tile_kernel=False))
    got = np.asarray(fixed_order_sums(jnp.asarray(x),
                                      interpret=_interpret()))
    np.testing.assert_array_equal(got, want)


def test_fixed_order_zz_sums_gate(rng):
    """Auto gate: int64 input and non-128-multiple rows stay on the XLA
    chain; shapes/dtypes are identical either way."""
    from flacx.ops.fixedpred import fixed_order_zz_sums

    x = rng.integers(-1000, 1000, size=(3, 2, 700)).astype(np.int64)
    out = np.asarray(fixed_order_zz_sums(jnp.asarray(x), 25))
    assert out.shape == (3, 2, 5) and out.dtype == np.int64


# ---------------------------------------------------------------------------
# Fused LPC residual kernel vs predict_residual + mask + reduces


@pytest.mark.parametrize("r, n, t", [
    (128, 4608, 12),     # flagship config
    (128, 531, 12),      # ragged tail tile
    (128, 700, 32),      # max order: lookbehind spans tile boundary
    (256, 512, 4),       # fixed-predictor tap count, one tile
])
def test_lpc_residual_tiles_matches_xla(rng, r, n, t):
    from flacx.kernels.lpcres_tile import lpc_residual_tiles
    from flacx.ops.lpc import predict_residual
    from flacx.ops.rice import zigzag

    x = jnp.asarray(rng.integers(-(1 << 16), 1 << 16,
                                 size=(r, n)).astype(np.int32))
    taps = rng.integers(-16, 16, size=(r, t)).astype(np.int32)
    order = rng.integers(0, min(t, 32) + 1, size=(r,)).astype(np.int32)
    for i in range(r):           # taps zero beyond each row's order
        taps[i, order[i]:] = 0
    shift = rng.integers(0, 15, size=(r,)).astype(np.int32)

    want_res = predict_residual(x, jnp.asarray(taps), jnp.asarray(shift),
                                jnp.int32)
    want_res = np.asarray(want_res * (jnp.arange(n) >= order[:, None]))
    want_lzz = np.asarray(zigzag(jnp.asarray(want_res))).sum(
        axis=-1, dtype=np.int64)
    want_mab = np.abs(want_res).max(axis=-1)

    res, lzz, mab = lpc_residual_tiles(x, jnp.asarray(taps),
                                       jnp.asarray(shift),
                                       jnp.asarray(order),
                                       interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(res), want_res)
    np.testing.assert_array_equal(np.asarray(lzz), want_lzz)
    np.testing.assert_array_equal(np.asarray(mab), want_mab)


def test_predict_residual_fused_gate(rng):
    """Auto gate falls back to the XLA path off-TPU / for wide rows and
    returns the same statistics triple."""
    from flacx.ops.lpc import predict_residual_fused

    x = jnp.asarray(rng.integers(-(1 << 22), 1 << 22,
                                 size=(3, 2, 300)).astype(np.int64))
    taps = jnp.asarray(rng.integers(-16, 16, size=(3, 2, 8)).astype(np.int32))
    shift = jnp.asarray(np.full((3, 2), 3, np.int32))
    order = jnp.asarray(np.full((3, 2), 8, np.int32))
    res, lzz, mab = predict_residual_fused(x, taps, shift, order,
                                           eff_bps=23, sum_taps_max=128)
    assert res.shape == (3, 2, 300) and lzz.dtype == np.int64
    assert mab.dtype == np.int32


# ---------------------------------------------------------------------------
# Emit kernel vs the XLA blocked emit path


def test_emit_sample_tiles_matches_xla(rng):
    from flacx.kernels.emit_tile import emit_sample_tiles
    from flacx.ops import rice
    from flacx.ops.emit import (KIND_CONSTANT, KIND_FIXED, KIND_LPC,
                                KIND_VERBATIM, partition_param_symbols,
                                sample_symbols)

    b, c, n, psize_min = 128, 2, 4608, 144
    nseg = n // psize_min
    kind = rng.integers(0, 4, size=(b, c)).astype(np.int32)
    kind[0] = [KIND_CONSTANT, KIND_VERBATIM]
    kind[1] = [KIND_FIXED, KIND_LPC]
    order = np.where(kind >= KIND_FIXED,
                     rng.integers(0, 33, size=(b, c)), 0).astype(np.int32)
    order = np.where(kind == KIND_LPC, np.maximum(order, 1), order)
    bps = rng.integers(8, 18, size=(b, c)).astype(np.int32)
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, c, n)).astype(np.int32)
    res = rng.integers(-2000, 2000, size=(b, c, n)).astype(np.int32)
    zz = np.asarray(rice.zigzag(jnp.asarray(res)))
    zz = zz * (np.arange(n) >= order[..., None])
    plan = rice.exact_plan(jnp.asarray(zz).astype(jnp.int64),
                           jnp.asarray(order), (0, 1, 2, 3, 4, 5),
                           (0, 1, 2, 3, 4, 5), 30)

    param_v, param_l = partition_param_symbols(jnp.asarray(kind), plan,
                                               n, psize_min)
    want_sv, want_sl = sample_symbols(jnp.asarray(kind), jnp.asarray(order),
                                      jnp.asarray(bps), jnp.asarray(x),
                                      jnp.asarray(zz), plan)
    kesc = (np.asarray(plan.k_seg).astype(np.int32)
            | (np.asarray(plan.esc_seg).astype(np.int32) << 7))
    # the per-segment form must agree with the per-sample expansion
    ks = np.asarray(plan.k_sample).reshape(b, c, nseg, psize_min)
    es = np.asarray(plan.esc_sample).reshape(b, c, nseg, psize_min)
    assert (ks == ks[..., :1]).all() and (es == es[..., :1]).all()
    np.testing.assert_array_equal(np.asarray(plan.k_seg), ks[..., 0])
    np.testing.assert_array_equal(np.asarray(plan.esc_seg), es[..., 0])

    for ch in range(c):
        got_v, got_l = emit_sample_tiles(
            jnp.asarray(zz.astype(np.int32)), jnp.asarray(x),
            jnp.asarray(kesc), param_v, param_l, jnp.asarray(kind),
            jnp.asarray(order), jnp.asarray(bps), ch, psize_min,
            interpret=_interpret())
        got_v = np.asarray(got_v)    # [1, S_pad, 128]
        got_l = np.asarray(got_l)

        # reference assembly of the blocked layout for this channel
        pv = np.asarray(param_v)[:, ch]
        plc = np.asarray(param_l)[:, ch]
        sv = np.asarray(want_sv)[:, ch]
        sl = np.asarray(want_sl)[:, ch]
        z7v = np.zeros((b, 7), np.uint32)
        z7l = np.zeros((b, 7), np.int32)
        vparts = [pv[:, :33], z7v, sv[:, :psize_min]]
        lparts = [plc[:, :33], z7l, sl[:, :psize_min]]
        for g in range(1, nseg):
            vparts += [pv[:, 32 + g: 33 + g], z7v,
                       sv[:, g * psize_min: (g + 1) * psize_min]]
            lparts += [plc[:, 32 + g: 33 + g], z7l,
                       sl[:, g * psize_min: (g + 1) * psize_min]]
        want_vc = np.concatenate(vparts, axis=-1)
        want_lc = np.concatenate(lparts, axis=-1)
        used = want_vc.shape[-1]
        np.testing.assert_array_equal(
            got_v[0, :used, :].T, want_vc, err_msg=f"values ch{ch}")
        np.testing.assert_array_equal(
            got_l[0, :used, :].T, want_lc, err_msg=f"lengths ch{ch}")
        assert not got_l[0, used:, :].any()


def test_transposed_merge_variants_match_classic(rng):
    """merge_tiles_t / merge_strings_t (pre-transposed, no HBM transposes)
    must reproduce the classic API bit-for-bit."""
    from flacx.kernels.bitpack_tile import (merge_strings, merge_strings_t,
                                            merge_tiles, merge_tiles_t)

    f, s = 8, 16                              # 16 strings per frame
    slots = s * TILE
    lengths = rng.integers(0, 33, size=(f, slots)).astype(np.int32)
    lengths[:, ::7] = 0
    values = (rng.integers(0, 1 << 31, size=(f, slots)).astype(np.uint32)
              & ((np.uint32(1) << np.minimum(lengths, 31)) - 1)
              .astype(np.uint32))
    values = np.where(lengths == 32,
                      values | np.uint32(1 << 31), values).astype(np.uint32)

    tw, tb = merge_tiles(jnp.asarray(values.reshape(-1, TILE)),
                         jnp.asarray(lengths.reshape(-1, TILE)),
                         interpret=_interpret())

    # transposed path: tiles on lanes (one grid cell per tile-slot)
    vt = jnp.asarray(values.reshape(f, s, TILE).transpose(1, 2, 0))
    lt = jnp.asarray(lengths.reshape(f, s, TILE).transpose(1, 2, 0))
    twt, tbt = merge_tiles_t(vt, lt, interpret=_interpret())
    # twt [s, TILE, f] -> compare against classic [f*s, TILE]
    np.testing.assert_array_equal(
        np.asarray(twt).transpose(2, 0, 1).reshape(-1, TILE),
        np.asarray(tw))
    np.testing.assert_array_equal(
        np.asarray(tbt).T.reshape(-1), np.asarray(tb))

    packed = merge_strings(jnp.asarray(tw).reshape(f, s, TILE),
                           jnp.asarray(tb).reshape(f, s),
                           interpret=_interpret(), lanes=f,
                           out_rows=3 * TILE)
    # strings stacked on sublanes, frames on lanes: [1, s*TILE, f]
    wt_t = jnp.asarray(np.asarray(twt).transpose(0, 1, 2)
                       .reshape(s * TILE, f)[None])
    bits_t = jnp.asarray(np.asarray(tbt)[None])   # [1, s, f]
    packed_t = merge_strings_t(wt_t, bits_t, lanes=f,
                               out_rows=3 * TILE,
                               interpret=_interpret())
    np.testing.assert_array_equal(
        np.asarray(packed_t)[0].T, np.asarray(packed))


@pytest.mark.parametrize("c,n", [(2, 4608), (4, 4608)])
def test_pack_frames_tiled_matches_classic(rng, c, n):
    """The kernel-resident emit→pack path must produce byte-identical
    frames to emit.subframe_symbols + pack_symbols_words (2-channel
    headline shape and a 4-channel layout — the c ≤ 8 gate, round 5)."""
    from flacx.ops import rice
    from flacx.ops.bitpack import pack_symbols_words, words_to_bytes
    from flacx.ops.emit import (KIND_CONSTANT, KIND_FIXED, KIND_LPC,
                                KIND_VERBATIM, subframe_symbols)
    from flacx.ops.headers import frame_header_symbols
    from flacx.ops.tilepack import pack_frames_tiled

    b, psize_min, t, prec = 128, 144, 12, 5
    kind = rng.integers(0, 4, size=(b, c)).astype(np.int32)
    kind[0, :2] = [KIND_CONSTANT, KIND_VERBATIM]
    kind[1, :2] = [KIND_FIXED, KIND_LPC]
    order = np.where(kind == KIND_FIXED, rng.integers(0, 5, size=(b, c)),
                     0).astype(np.int32)
    order = np.where(kind == KIND_LPC,
                     rng.integers(1, t + 1, size=(b, c)), order)
    bps = rng.integers(8, 18, size=(b, c)).astype(np.int32)
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, c, n)).astype(np.int32)
    x[0, 0] = 77                   # constant subframe: constant values
    taps = rng.integers(-16, 16, size=(b, c, t)).astype(np.int32)
    taps = taps * (np.arange(t) < order[..., None])
    shift = np.where(kind == KIND_LPC,
                     rng.integers(0, 15, size=(b, c)), 0).astype(np.int32)
    wasted = np.zeros((b, c), np.int32)
    res = rng.integers(-2000, 2000, size=(b, c, n)).astype(np.int32)
    zz = np.asarray(rice.zigzag(jnp.asarray(res)))
    zz = (zz * (np.arange(n) >= order[..., None])).astype(np.int32)
    plan = rice.exact_plan(jnp.asarray(zz).astype(jnp.int64),
                           jnp.asarray(order), (0, 1, 2, 3, 4, 5),
                           (0, 1, 2, 3, 4, 5), 30)

    indices = jnp.arange(b, dtype=jnp.int64) + 7
    ch_code = jnp.full((b,), 2, jnp.int32)
    hdr = frame_header_symbols(indices, ch_code, n)
    max_bytes = (((16 * 8 + c * (8 + n * 18) + 64) // 8 + 2) + 127) \
        // 128 * 128

    ja = jnp.asarray
    sv, sl = subframe_symbols(ja(kind), ja(order), ja(bps), ja(x), ja(taps),
                              ja(shift), prec, ja(zz), plan, psize_min,
                              wasted=ja(wasted))
    sv, sl = sv.reshape(b, -1), sl.reshape(b, -1)
    body = (jnp.sum(hdr.lengths, -1)
            + jnp.sum(sl, -1, dtype=jnp.int64)).astype(jnp.int32)
    pad = (-body) % 8
    values = jnp.concatenate([hdr.values, sv,
                              jnp.zeros((b, 1), jnp.uint32)], -1)
    lengths = jnp.concatenate([hdr.lengths, sl, pad[:, None]], -1)
    want_words, want_bits = pack_symbols_words(values, lengths, max_bytes,
                                               use_tile_kernel=False)
    want_nbytes = np.asarray(want_bits) // 8
    want_bytes = np.asarray(words_to_bytes(want_words))

    got_words, got_bits, got_crc = pack_frames_tiled(
        hdr.values, hdr.lengths, ja(kind), ja(order), ja(bps), ja(x),
        ja(taps), ja(shift), prec, ja(zz), plan, ja(wasted), psize_min,
        max_bytes, interpret=_interpret())
    got_nbytes = (np.asarray(got_bits) + 7) // 8
    # words come back byteswapped: the byte split is a free LE bitcast
    got_bytes = np.asarray(got_words).view(np.uint8) \
        .reshape(got_words.shape[0], -1)
    from flacx.ops.crcfold import crc16_over_word_rows
    want_crc = np.asarray(crc16_over_word_rows(
        want_words, jnp.asarray(want_nbytes)))
    np.testing.assert_array_equal(np.asarray(got_crc) & 0xFFFF, want_crc)

    np.testing.assert_array_equal(got_nbytes, want_nbytes)
    for i in range(b):
        np.testing.assert_array_equal(
            got_bytes[i, : got_nbytes[i]], want_bytes[i, : want_nbytes[i]],
            err_msg=f"frame {i}")
        assert not got_bytes[i, got_nbytes[i]:].any()


def test_pack_frames_tiled_segmented_matches_classic(rng):
    """The SEGMENTED tile-emit layout (psize_min < 40, here 1 — the
    hi-res ``-r 14`` shape) must be byte-identical to the classic
    emit→pack path."""
    from flacx.ops import rice
    from flacx.ops.bitpack import pack_symbols_words, words_to_bytes
    from flacx.ops.emit import (KIND_CONSTANT, KIND_FIXED, KIND_LPC,
                                KIND_VERBATIM, segmented_layout,
                                subframe_symbols)
    from flacx.ops.headers import frame_header_symbols
    from flacx.ops.tilepack import pack_frames_tiled

    b, c, n, t, prec = 128, 2, 256, 8, 5
    porders = tuple(range(9))                 # psize_min = 1
    psize_min = 1
    assert segmented_layout(n, psize_min) is not None
    kind = rng.integers(0, 4, size=(b, c)).astype(np.int32)
    kind[0] = [KIND_CONSTANT, KIND_VERBATIM]
    kind[1] = [KIND_FIXED, KIND_LPC]
    order = np.where(kind == KIND_FIXED, rng.integers(0, 5, size=(b, c)),
                     0).astype(np.int32)
    order = np.where(kind == KIND_LPC,
                     rng.integers(1, t + 1, size=(b, c)), order)
    bps = rng.integers(8, 18, size=(b, c)).astype(np.int32)
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, c, n)).astype(np.int32)
    x[0, 0] = 77
    taps = rng.integers(-16, 16, size=(b, c, t)).astype(np.int32)
    taps = taps * (np.arange(t) < order[..., None])
    shift = np.where(kind == KIND_LPC,
                     rng.integers(0, 15, size=(b, c)), 0).astype(np.int32)
    wasted = np.zeros((b, c), np.int32)
    res = rng.integers(-2000, 2000, size=(b, c, n)).astype(np.int32)
    zz = np.asarray(rice.zigzag(jnp.asarray(res)))
    zz = (zz * (np.arange(n) >= order[..., None])).astype(np.int32)
    plan = rice.exact_plan(jnp.asarray(zz).astype(jnp.int64),
                           jnp.asarray(order), porders, porders, 30)

    indices = jnp.arange(b, dtype=jnp.int64) + 3
    ch_code = jnp.full((b,), 2, jnp.int32)
    hdr = frame_header_symbols(indices, ch_code, n)
    max_bytes = (((16 * 8 + c * (8 + n * 18) + 64) // 8 + 2) + 127) \
        // 128 * 128

    ja = jnp.asarray
    sv, sl = subframe_symbols(ja(kind), ja(order), ja(bps), ja(x), ja(taps),
                              ja(shift), prec, ja(zz), plan, psize_min,
                              wasted=ja(wasted))
    sv, sl = sv.reshape(b, -1), sl.reshape(b, -1)
    body = (jnp.sum(hdr.lengths, -1)
            + jnp.sum(sl, -1, dtype=jnp.int64)).astype(jnp.int32)
    pad = (-body) % 8
    values = jnp.concatenate([hdr.values, sv,
                              jnp.zeros((b, 1), jnp.uint32)], -1)
    lengths = jnp.concatenate([hdr.lengths, sl, pad[:, None]], -1)
    want_words, want_bits = pack_symbols_words(values, lengths, max_bytes,
                                               use_tile_kernel=False)
    want_nbytes = np.asarray(want_bits) // 8
    want_bytes = np.asarray(words_to_bytes(want_words))

    got_words, got_bits, got_crc = pack_frames_tiled(
        hdr.values, hdr.lengths, ja(kind), ja(order), ja(bps), ja(x),
        ja(taps), ja(shift), prec, ja(zz), plan, ja(wasted), psize_min,
        max_bytes, interpret=_interpret())
    got_nbytes = (np.asarray(got_bits) + 7) // 8
    # words come back byteswapped: the byte split is a free LE bitcast
    got_bytes = np.asarray(got_words).view(np.uint8) \
        .reshape(got_words.shape[0], -1)
    from flacx.ops.crcfold import crc16_over_word_rows
    want_crc = np.asarray(crc16_over_word_rows(
        want_words, jnp.asarray(want_nbytes)))
    np.testing.assert_array_equal(np.asarray(got_crc) & 0xFFFF, want_crc)

    np.testing.assert_array_equal(got_nbytes, want_nbytes)
    for i in range(b):
        np.testing.assert_array_equal(
            got_bytes[i, : got_nbytes[i]], want_bytes[i, : want_nbytes[i]],
            err_msg=f"frame {i}")
        assert not got_bytes[i, got_nbytes[i]:].any()


def test_segmented_layout_gating():
    """Chunking legality of the segmented layout across psize shapes."""
    from flacx.ops.emit import segmented_layout

    assert segmented_layout(16384, 1)[0] == 256      # hi-res -r 14
    assert segmented_layout(16384, 8)[0] == 512      # -r 11
    assert segmented_layout(4608, 9)[0] == 256       # 4608 at -r 9
    assert segmented_layout(2048, 8) is None         # nseg 256 < chunk 512
    assert segmented_layout(3584, 7) is None         # chunk width 448 % 128
    assert segmented_layout(512, 512) is None        # n == psize_min


def test_zigzag_residual_tiles_matches_xla(rng):
    """Fused post-selection residual+zigzag kernel == the XLA chain
    (fixed recompute / LPC / warmup mask / zigzag) it replaces."""
    from flacx.kernels.lpcres_tile import zigzag_residual_tiles
    from flacx.ops.lpc import predict_residual
    from flacx.ops.rice import zigzag

    b, c, n, t = 128, 2, 640, 12        # n a multiple of 128 (block gate)
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, c, n)).astype(np.int32)
    order = rng.integers(0, t + 1, size=(b, c)).astype(np.int32)
    taps = rng.integers(-16, 16, size=(b, c, t)).astype(np.int32)
    taps[np.arange(t)[None, None, :] >= order[..., None]] = 0
    shift = rng.integers(0, 15, size=(b, c)).astype(np.int32)
    shift[order == 0] = 0

    got = np.asarray(zigzag_residual_tiles(
        jnp.asarray(x), jnp.asarray(taps), jnp.asarray(shift),
        jnp.asarray(order), interpret=_interpret()))
    res = predict_residual(jnp.asarray(x), jnp.asarray(taps),
                           jnp.asarray(shift), jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    want = np.asarray(zigzag(res) * (i >= jnp.asarray(order)[..., None]))
    np.testing.assert_array_equal(got, want)


def test_split_mac_stats_match_int64(rng):
    """Two-limb split-int32 stats (hi-res widths) vs int64 reference:
    identical eligibility on pathological lanes, exact lzz/maxabs on
    every keepable lane."""
    from flacx.kernels.lpcres_tile import (lpc_residual_stats,
                                           split_mac_ok,
                                           zigzag_residual_tiles)

    r, n, t = 128, 1300, 32
    assert split_mac_ok(25, 512) and not split_mac_ok(29, 512) \
        and not split_mac_ok(25, 1 << 12)
    x = rng.integers(-(1 << 24), 1 << 24, size=(r, n)).astype(np.int32)
    taps = rng.integers(-16, 16, size=(r, t)).astype(np.int32)
    order = rng.integers(1, t + 1, size=(r,)).astype(np.int32)
    taps[np.arange(t)[None] >= order[:, None]] = 0
    shift = rng.integers(0, 16, size=(r,)).astype(np.int32)
    for i in range(16):              # pathological: max taps, no shift
        taps[i, : order[i]] = 16 if i % 2 else -16
        shift[i] = 0

    x64 = x.astype(np.int64)
    acc = np.zeros((r, n), np.int64)
    for j in range(t):
        lag = np.zeros_like(x64)
        lag[:, j + 1:] = x64[:, : n - j - 1]
        acc += taps[:, j: j + 1].astype(np.int64) * lag
    res = x64 - (acc >> shift[:, None])
    res[np.arange(n)[None] < order[:, None]] = 0
    lzz_ref = ((res << 1) ^ (res >> 63)).sum(1)
    mab_ref = np.minimum(np.abs(res).max(1), (1 << 31) - 1)

    lzz, mab = lpc_residual_stats(jnp.asarray(x), jnp.asarray(taps),
                                  jnp.asarray(shift), jnp.asarray(order),
                                  split=True, interpret=_interpret())
    lzz, mab = np.asarray(lzz), np.asarray(mab)
    kept = mab_ref < (1 << 30)
    assert kept.sum() > r // 2            # the test exercises both sides
    np.testing.assert_array_equal(kept, mab < (1 << 30))
    np.testing.assert_array_equal(lzz[kept], lzz_ref[kept])
    np.testing.assert_array_equal(mab[kept], mab_ref[kept])

    # chunked split zigzag-residual (hi-res n > 8192): exact wherever
    # the encoder can select the lane
    n2 = 10000
    x2 = rng.integers(-(1 << 24), 1 << 24,
                      size=(r, 1, n2)).astype(np.int32)
    taps2 = rng.integers(-16, 16, size=(r, 1, t)).astype(np.int32)
    order2 = rng.integers(1, t + 1, size=(r, 1)).astype(np.int32)
    taps2[np.arange(t)[None, None] >= order2[..., None]] = 0
    shift2 = rng.integers(8, 16, size=(r, 1)).astype(np.int32)
    zz = np.asarray(zigzag_residual_tiles(
        jnp.asarray(x2), jnp.asarray(taps2), jnp.asarray(shift2),
        jnp.asarray(order2), split=True, interpret=_interpret()))
    acc2 = np.zeros((r, 1, n2), np.int64)
    x264 = x2.astype(np.int64)
    for j in range(t):
        lag = np.zeros_like(x264)
        lag[..., j + 1:] = x264[..., : n2 - j - 1]
        acc2 += taps2[..., j: j + 1].astype(np.int64) * lag
    res2 = x264 - (acc2 >> shift2[..., None])
    res2[np.broadcast_to(np.arange(n2), res2.shape)
         < order2[..., None]] = 0
    zz_ref = (res2 << 1) ^ (res2 >> 63)
    ok = np.abs(res2).max(-1) < (1 << 30)
    assert ok.all()                       # sane shifts: all selectable
    np.testing.assert_array_equal(
        zz[ok], zz_ref[ok].astype(np.int64)
        .astype(np.uint32).astype(np.int32))


def test_lpc_residual_stats_matches_full(rng):
    """Stats-only lpcres variant (incl. 3D input) == full-kernel stats."""
    from flacx.kernels.lpcres_tile import (lpc_residual_stats,
                                           lpc_residual_tiles)

    b, v, n, t = 32, 4, 520, 8
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, v, n)).astype(np.int32)
    order = rng.integers(1, t + 1, size=(b * v,)).astype(np.int32)
    taps = rng.integers(-16, 16, size=(b * v, t)).astype(np.int32)
    taps[np.arange(t)[None, :] >= order[:, None]] = 0
    shift = rng.integers(0, 15, size=(b * v,)).astype(np.int32)

    _, lzz_want, mab_want = lpc_residual_tiles(
        jnp.asarray(x.reshape(-1, n)), jnp.asarray(taps),
        jnp.asarray(shift), jnp.asarray(order), interpret=_interpret())
    lzz, mab = lpc_residual_stats(
        jnp.asarray(x), jnp.asarray(taps), jnp.asarray(shift),
        jnp.asarray(order), interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(lzz).ravel(),
                                  np.asarray(lzz_want))
    np.testing.assert_array_equal(np.asarray(mab).ravel(),
                                  np.asarray(mab_want))


def test_autocorr_tiled_int32_3d_matches_f32(rng):
    """int32 + 3D input converts in-kernel; equals the f32 2D path."""
    from flacx.kernels.autocorr_tile import autocorr_tiled

    b, v, n = 32, 4, 700
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, v, n)).astype(np.int32)
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)) \
        .astype(np.float32)
    got = np.asarray(autocorr_tiled(jnp.asarray(x), 8,
                                    window=jnp.asarray(win),
                                    interpret=_interpret()))
    want = np.asarray(autocorr_tiled(
        jnp.asarray(x.reshape(-1, n).astype(np.float32)), 8,
        window=jnp.asarray(win), interpret=_interpret()))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fixed_order_sums_3d_matches_2d(rng):
    from flacx.kernels.zzsum_tile import fixed_order_sums

    b, v, n = 32, 4, 530
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, v, n)).astype(np.int32)
    got = np.asarray(fixed_order_sums(jnp.asarray(x),
                                      interpret=_interpret()))
    want = np.asarray(fixed_order_sums(jnp.asarray(x.reshape(-1, n)),
                                       interpret=_interpret()))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("s", [3, 11, 22])
def test_merge_strings_odd_counts(rng, s):
    """Non-power-of-two string stacks (round 5): odd levels pass the
    last string through — result must equal the bit-writer ground truth."""
    from flacx.kernels.bitpack_tile import merge_strings, merge_strings_t

    f = 8
    bits = rng.integers(0, 1400, size=(f, s)).astype(np.int32)
    bits[:, 1] = 0
    words = np.zeros((f, s, TILE), np.uint32)
    payload = rng.integers(0, 1 << 32, size=(f, s, TILE), dtype=np.uint64)
    for i in range(f):
        for j in range(s):
            nb = int(bits[i, j])
            full, rem = divmod(nb, 32)
            w = payload[i, j].astype(np.uint32).copy()
            w[full + 1:] = 0
            if rem:
                w[full] &= np.uint32((0xFFFFFFFF << (32 - rem))
                                     & 0xFFFFFFFF)
            else:
                w[full:] = 0
            words[i, j] = w

    # ground truth via the host bit writer
    out_rows = 2 * TILE
    want = np.zeros((f, out_rows), np.uint32)
    for i in range(f):
        bw = BitWriter()
        for j in range(s):
            nb = int(bits[i, j])
            for wv in range(0, nb, 32):
                take = min(32, nb - wv)
                bw.write_uint(int(words[i, j, wv // 32]) >> (32 - take), take)
        bw.pad_to_byte()
        data = bw.getvalue() + b"\x00" * 3
        arr = np.frombuffer(data[: out_rows * 4].ljust(out_rows * 4,
                                                       b"\x00"),
                            dtype=">u4").astype(np.uint32)
        want[i] = arr

    packed = merge_strings(jnp.asarray(words), jnp.asarray(bits),
                           interpret=_interpret(), lanes=f,
                           out_rows=out_rows)
    np.testing.assert_array_equal(np.asarray(packed), want)

    wt_t = jnp.asarray(words.reshape(f, s * TILE).T[None])
    bits_t = jnp.asarray(bits.T[None])
    packed_t = merge_strings_t(wt_t, bits_t, lanes=f, out_rows=out_rows,
                               interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(packed_t)[0].T, want)

    from flacx.kernels.bitpack_tile import merge_strings_t_leveled
    packed_l = merge_strings_t_leveled(wt_t, bits_t, out_rows=out_rows,
                                       interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(packed_l)[0].T, want)


def test_lpc_allorder_stats_matches_stack(rng):
    """All-orders stats kernel vs the [B,V,P,N] residual stack it
    replaces (exact-order search, round 5)."""
    from flacx.kernels.lpcres_tile import (allorder_stats_ok,
                                           lpc_allorder_stats)
    from flacx.ops.lpc import lpc_residuals_all
    from flacx.ops.rice import zigzag

    b, v, n, p, t = 32, 4, 1024, 12, 12
    assert allorder_stats_ok(17, p << 4)
    x = rng.integers(-(1 << 15), 1 << 15, size=(b, v, n)).astype(np.int32)
    qcoefs = rng.integers(-16, 16, size=(b, v, p, t)).astype(np.int32)
    order_mask = np.arange(t) < (np.arange(1, p + 1))[:, None]
    qcoefs = qcoefs * order_mask
    shifts = rng.integers(0, 15, size=(b, v, p)).astype(np.int32)

    lzz, mab = lpc_allorder_stats(jnp.asarray(x), jnp.asarray(qcoefs),
                                  jnp.asarray(shifts), interpret=True)

    res = lpc_residuals_all(jnp.asarray(x), jnp.asarray(qcoefs),
                            jnp.asarray(shifts), jnp.int64)
    i_pos = np.arange(n)
    lmask = i_pos >= np.arange(1, p + 1)[:, None]
    want_lzz = np.asarray(jnp.sum(zigzag(res) * lmask, axis=-1,
                                  dtype=jnp.int64))
    want_mab = np.asarray(jnp.max(jnp.abs(res * lmask), axis=-1))

    np.testing.assert_array_equal(np.asarray(lzz), want_lzz)
    np.testing.assert_array_equal(np.asarray(mab), want_mab)
