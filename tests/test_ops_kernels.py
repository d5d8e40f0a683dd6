"""Device kernels vs pure-Python/numpy oracles (CPU backend, 8 virt devices)."""

import numpy as np
import pytest

import flacx.ops  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from flacx.bitio import BitWriter
from flacx.crc import crc8, crc16
from flacx.format import FIXED_PREDICTOR_COEFFICIENTS
from flacx.ops.bitpack import pack_symbols
from flacx.ops.crcfold import crc8_fold, crc16_over_rows
from flacx.ops.fixedpred import fixed_residuals
from flacx.ops.lpc import (autocorrelate, levinson_all_orders,
                           lpc_residuals_all, predict_residual,
                           quantize_all_orders, tukey_window_np)
from flacx.ops.rice import exact_plan, zigzag
from flacx.oracle import analyze as oa
from flacx.utils import zigzag_encode

from conftest import make_pcm


def test_fixed_residuals_match_oracle(rng):
    x = rng.integers(-32768, 32768, size=(3, 64)).astype(np.int32)
    got = np.asarray(fixed_residuals(jnp.asarray(x)))
    for b in range(3):
        for order, coefs in enumerate(FIXED_PREDICTOR_COEFFICIENTS):
            want = oa.predict_residual(list(map(int, x[b])), coefs)
            np.testing.assert_array_equal(got[b, order, order:], want)


def test_lpc_analysis_matches_oracle(rng):
    n, p, prec = 512, 8, 5
    pcm = make_pcm(rng, n, 1, 16, "tonal")[:, 0]
    w = tukey_window_np(n)
    xw = jnp.asarray(pcm.astype(np.float64) * w)[None, :]

    autoc = autocorrelate(xw, p)
    want_autoc = oa.autocorrelation([float(v) for v in (pcm * w)], p + 1)
    # XLA reduces pairwise vs the oracle's left-to-right sum: agreement is
    # to rounding, not bit-exact (Levinson then amplifies the ulps).
    np.testing.assert_allclose(np.asarray(autoc)[0], want_autoc, rtol=1e-12)

    taps, errors, valid = levinson_all_orders(autoc, p)
    qcoefs, shifts, finite = quantize_all_orders(taps, prec)
    assert bool(valid.all()) and bool(finite.all())

    for order in range(1, p + 1):
        want_taps = oa.levinson_durbin(want_autoc[: order + 1])
        np.testing.assert_allclose(np.asarray(taps)[0, order - 1, :order],
                                   want_taps, rtol=1e-5, atol=1e-8)

    # Quantization on IDENTICAL float inputs must match the oracle exactly
    # (same op order, round-half-even).
    oracle_taps = np.zeros((1, p, p))
    for order in range(1, p + 1):
        oracle_taps[0, order - 1, :order] = oa.levinson_durbin(
            want_autoc[: order + 1])
    q2, s2, f2 = quantize_all_orders(jnp.asarray(oracle_taps), prec)
    for order in range(1, p + 1):
        wq, ws = oa.quantize_coefficients(
            list(oracle_taps[0, order - 1, :order]), prec)
        assert int(s2[0, order - 1]) == ws
        np.testing.assert_array_equal(np.asarray(q2)[0, order - 1, :order], wq)

    # Residuals from the DEVICE-chosen coefficients must be exactly what the
    # integer oracle produces for those same coefficients.
    res = lpc_residuals_all(jnp.asarray(pcm.astype(np.int32))[None], qcoefs,
                            shifts)
    qc_np, sh_np = np.asarray(qcoefs), np.asarray(shifts)
    for order in range(1, p + 1):
        want_res = oa.predict_residual(
            list(map(int, pcm)), list(map(int, qc_np[0, order - 1, :order])),
            int(sh_np[0, order - 1]))
        np.testing.assert_array_equal(np.asarray(res)[0, order - 1, order:],
                                      want_res)


def test_predict_residual_unified(rng):
    x = rng.integers(-1 << 20, 1 << 20, size=(2, 96)).astype(np.int64)
    taps = np.zeros((2, 12), np.int32)
    taps[0, :3] = [9, -4, 1]
    taps[1, :5] = [31, -12, 7, -2, 1]
    shift = np.array([2, 4], np.int32)
    got = np.asarray(predict_residual(jnp.asarray(x), jnp.asarray(taps),
                                      jnp.asarray(shift)))
    for b, order in [(0, 3), (1, 5)]:
        want = oa.predict_residual(list(map(int, x[b])),
                                   list(map(int, taps[b, :order])),
                                   int(shift[b]))
        np.testing.assert_array_equal(got[b, order:], want)


def test_predict_residual_int32_acc_bit_identical(rng):
    """int32 MAC accumulation == int64 within the static bound the
    encoder gates on (eff_bps+1+ceil(log2(Σ|taps|)) ≤ 31)."""
    x = rng.integers(-(1 << 17), 1 << 17, size=(8, 512)).astype(np.int32)
    taps = rng.integers(-16, 17, size=(8, 12)).astype(np.int32)
    shift = rng.integers(0, 15, size=(8,)).astype(np.int32)
    a64 = np.asarray(predict_residual(jnp.asarray(x), jnp.asarray(taps),
                                      jnp.asarray(shift)))
    a32 = np.asarray(predict_residual(jnp.asarray(x), jnp.asarray(taps),
                                      jnp.asarray(shift), jnp.int32))
    assert a32.dtype == np.int32
    np.testing.assert_array_equal(a32.astype(np.int64), a64)


def test_acc_dtype_config_gate():
    from flacx.encoder import EncoderConfig
    assert EncoderConfig().lpc_acc_dtype == jnp.int32          # 16/5/12
    assert EncoderConfig().fixed_acc_dtype == jnp.int32
    hi = EncoderConfig(bps=24, block_size=16384, max_lpc_order=32,
                       qlp_precision=15)
    assert hi.lpc_acc_dtype == jnp.int64                       # 25+1+19
    assert hi.fixed_acc_dtype == jnp.int32                     # 25+1+4
    assert EncoderConfig(bps=32, channels=1).fixed_acc_dtype == jnp.int64


def test_zigzag_matches(rng):
    r = rng.integers(-1 << 40, 1 << 40, size=128)
    got = np.asarray(zigzag(jnp.asarray(r)))
    want = [zigzag_encode(int(v)) for v in r]
    np.testing.assert_array_equal(got, want)


def _brute_force_rice(zz, order, porders, preferred, kmax, n):
    from flacx.ops.rice import CODE_BITS_MAX
    best = None
    for po in porders:
        nparts = 1 << po
        psize = n >> po
        if psize <= order:
            continue
        bias = 0 if po in preferred else 1 << 40
        for width in (4, 5):
            klim = min(kmax, 14) if width == 4 else kmax
            total = 6
            for p in range(nparts):
                lo = 0 if p == 0 else p * psize
                # partition 0 spans [0, psize) but warmup zz entries are 0
                part = zz[lo: (p + 1) * psize]
                cnt = psize - (order if p == 0 else 0)
                sizes = [sum(int(u) >> k for u in part) + (k + 1) * cnt
                         for k in range(klim + 1)
                         if (max(part) >> k) + k + 1 <= CODE_BITS_MAX]
                if not sizes:
                    total = None
                    break
                total += width + min(sizes)
            if total is None:
                continue
            cand = (total + bias, po, width)
            if best is None or cand < best:
                best = cand
    return best[0] - (best[0] >= (1 << 40)) * (1 << 40), best[1], best[2]


def test_exact_rice_plan_vs_bruteforce_no_floor(rng):
    """Full partition-order range (VERDICT round-2 #1): sub-64-sample
    partitions down to psize=1 are searched exactly — same filter as the
    reference (flac/encoder.py:655-695), no floor, no cap."""
    n, kmax = 64, 12
    porders = tuple(range(7))          # psize 64 .. 1
    for scale in [3, 200, 40000]:
        r = rng.integers(-scale, scale, size=n)
        order = int(rng.integers(0, 5))
        r[:order] = 0
        zz = np.array([zigzag_encode(int(v)) for v in r], np.int64)
        plan = exact_plan(jnp.asarray(zz)[None], jnp.asarray([order]),
                          porders, porders, kmax, allow_escape=False)
        want_bits, want_po, want_width = _brute_force_rice(
            zz, order, porders, porders, kmax, n)
        assert int(plan.bits[0]) == want_bits
        assert int(plan.porder[0]) == want_po
        assert int(plan.width[0]) == want_width


def test_exact_rice_plan_kchunked_path(rng):
    """nparts > 2048 activates the k-chunked accumulation; the result
    must equal the brute-force sweep exactly."""
    n, kmax = 4096, 8
    porders = tuple(range(13))         # psize 4096 .. 1, nparts up to 4096
    r = rng.integers(-900, 900, size=n)
    order = 3
    r[:order] = 0
    zz = np.array([zigzag_encode(int(v)) for v in r], np.int64)
    plan = exact_plan(jnp.asarray(zz)[None], jnp.asarray([order]),
                      porders, porders, kmax, allow_escape=False)
    want_bits, want_po, want_width = _brute_force_rice(
        zz, order, porders, porders, kmax, n)
    assert int(plan.bits[0]) == want_bits
    assert int(plan.porder[0]) == want_po
    assert int(plan.width[0]) == want_width


def test_exact_rice_plan_vs_bruteforce(rng):
    n, kmax = 64, 18
    porders = (0, 1, 2, 3)
    for trial, scale in enumerate([3, 200, 40000]):
        r = rng.integers(-scale, scale, size=n)
        order = int(rng.integers(0, 5))
        r[:order] = 0
        zz = np.array([zigzag_encode(int(v)) for v in r], np.int64)
        # the brute-force oracle enumerates Rice codings only — disable
        # escapes here and check separately that they never hurt
        plan = exact_plan(jnp.asarray(zz)[None], jnp.asarray([order]),
                          porders, porders, kmax, allow_escape=False)
        plan_esc = exact_plan(jnp.asarray(zz)[None], jnp.asarray([order]),
                              porders, porders, kmax)
        want_bits, want_po, want_width = _brute_force_rice(
            zz, order, porders, porders, kmax, n)
        assert int(plan_esc.bits[0]) <= want_bits
        assert int(plan.bits[0]) == want_bits
        assert int(plan.porder[0]) == want_po
        assert int(plan.width[0]) == want_width
        # per-sample parameters must reproduce the exact chosen size
        k = np.asarray(plan.k_sample[0])
        psize = n >> want_po
        rice_bits = sum(int(zz[i] >> k[i]) + 1 + int(k[i])
                        for i in range(n) if i >= order)
        params = 6 + want_width * (1 << want_po)
        assert rice_bits + params == want_bits
        starts = np.asarray(plan.param_start[0])
        want_starts = [i for i in range(n)
                       if i == order or (i % psize == 0 and i > 0)]
        assert list(np.nonzero(starts)[0]) == want_starts


def _symbol_case(rng, b, s, max_len=32):
    lengths = rng.integers(0, max_len + 1, size=(b, s)).astype(np.int32)
    lengths[:, ::7] = 0
    lengths[0, 3] = 31  # max-length zero run
    values = np.zeros((b, s), np.uint32)
    for bi in range(b):
        for si in range(s):
            l = int(lengths[bi, si])
            if l:
                values[bi, si] = int(
                    rng.integers(0, 1 << min(l, 31))) | ((l == 32) << 31)
    # pad rows to byte alignment with a final symbol
    pad = (-lengths.sum(axis=1)) % 8
    lengths = np.concatenate([lengths, pad[:, None]], axis=1)
    values = np.concatenate([values, np.zeros((b, 1), np.uint32)], axis=1)
    return values, lengths


@pytest.mark.parametrize("impl", ["tree", "scatter", "per_bit"])
def test_pack_symbols_vs_bitwriter(rng, impl):
    from flacx.ops.bitpack import pack_symbols_per_bit, pack_symbols_scatter
    fn = {"tree": pack_symbols, "scatter": pack_symbols_scatter,
          "per_bit": pack_symbols_per_bit}[impl]
    b, s = 4, 200
    values, lengths = _symbol_case(rng, b, s)
    max_bytes = 1024
    got_bytes, got_bits = fn(jnp.asarray(values), jnp.asarray(lengths),
                             max_bytes)
    got_bytes, got_bits = np.asarray(got_bytes), np.asarray(got_bits)
    for bi in range(b):
        w = BitWriter()
        for si in range(lengths.shape[1]):
            w.write_uint(int(values[bi, si]), int(lengths[bi, si]))
        want = w.getvalue()
        assert got_bits[bi] == 8 * len(want)
        np.testing.assert_array_equal(got_bytes[bi, : len(want)],
                                      np.frombuffer(want, np.uint8))
        assert not got_bytes[bi, len(want):].any()


def test_pack_symbols_long_zero_runs_scatter(rng):
    # the scatter variant also supports >32-bit zero-run symbols
    from flacx.ops.bitpack import pack_symbols_scatter
    lengths = np.array([[8, 55, 3, 0, 6]], np.int32)
    values = np.array([[0xAB, 0, 5, 0, 0x2A]], np.uint32)
    got, bits = pack_symbols_scatter(jnp.asarray(values),
                                     jnp.asarray(lengths), 64)
    w = BitWriter()
    for v, l in zip(values[0], lengths[0]):
        w.write_uint(int(v), int(l))
    want = w.getvalue()
    assert int(bits[0]) == 72
    np.testing.assert_array_equal(np.asarray(got)[0, :9],
                                  np.frombuffer(want, np.uint8))


def test_crc_fold_matches_host(rng):
    b, l = 8, 96
    data = rng.integers(0, 256, size=(b, l)).astype(np.uint8)
    lengths = rng.integers(1, l + 1, size=b).astype(np.int32)
    # contract of crc16_over_rows: bytes past each row's length are zero
    # (the bit packer guarantees this)
    data[np.arange(l) >= lengths[:, None]] = 0
    got16 = np.asarray(crc16_over_rows(jnp.asarray(data),
                                       jnp.asarray(lengths)))
    pos = np.arange(l)
    dist = lengths[:, None] - 1 - pos
    got8 = np.asarray(crc8_fold(jnp.asarray(data.astype(np.uint32)),
                                jnp.asarray(dist), jnp.asarray(dist >= 0)))
    for i in range(b):
        assert got16[i] == crc16(bytes(data[i, : lengths[i]]))
        assert got8[i] == crc8(bytes(data[i, : lengths[i]]))


def test_fixed_parallel_reconstruction_matches_scan(rng):
    """reconstruct_fixed_parallel (masked-cumsum inverse differences) must
    be bit-identical to the sequential scan for every fixed order mix, in
    both dtypes — including values that wrap int32 (mod-2^32 adds)."""
    from flacx.ops.reconstruct import (reconstruct_fixed_parallel,
                                       reconstruct_predicted)

    taps_rows = [list(r) for r in FIXED_PREDICTOR_COEFFICIENTS]
    b, c, n = 12, 2, 531
    order = rng.integers(0, 5, size=(b, c)).astype(np.int32)
    taps = np.zeros((b, c, 4), np.int32)
    for i in range(b):
        for j in range(c):
            row = taps_rows[int(order[i, j])]
            taps[i, j, : len(row)] = row
    res = rng.integers(-3000, 3000, size=(b, c, n)).astype(np.int32)
    shift = np.zeros((b, c), np.int32)

    for dt in (jnp.int32, jnp.int64):
        want = np.asarray(reconstruct_predicted(
            jnp.asarray(res), jnp.asarray(taps), jnp.asarray(shift),
            jnp.asarray(order), dtype=dt))
        got = np.asarray(reconstruct_fixed_parallel(
            jnp.asarray(res), jnp.asarray(order), 4, dtype=dt))
        np.testing.assert_array_equal(got, want)

    # max_order below 4: lanes clipped to the static bound stay exact
    o1 = np.minimum(order, 1).astype(np.int32)
    got1 = np.asarray(reconstruct_fixed_parallel(
        jnp.asarray(res), jnp.asarray(o1), 1, dtype=jnp.int32))
    t1 = np.zeros_like(taps)
    t1[..., 0] = np.where(o1 == 1, 1, 0)
    want1 = np.asarray(reconstruct_predicted(
        jnp.asarray(res), jnp.asarray(t1), jnp.asarray(shift),
        jnp.asarray(o1), dtype=jnp.int32))
    np.testing.assert_array_equal(got1, want1)


def test_crc16_over_word_rows_matches_byte_fold(rng):
    from flacx.crc import crc16
    from flacx.ops.bitpack import words_to_bytes
    from flacx.ops.crcfold import crc16_over_word_rows

    b, w = 5, 96
    data = rng.integers(0, 256, size=(b, w * 4)).astype(np.uint8)
    lengths = np.array([0, 1, 37, 383, 384], np.int64)
    for i in range(b):
        data[i, lengths[i]:] = 0        # contract: zero past the length
    words = ((data[:, 0::4].astype(np.uint32) << 24)
             | (data[:, 1::4].astype(np.uint32) << 16)
             | (data[:, 2::4].astype(np.uint32) << 8)
             | data[:, 3::4])
    got = np.asarray(crc16_over_word_rows(jnp.asarray(words),
                                          jnp.asarray(lengths)))
    for i in range(b):
        assert got[i] == crc16(bytes(data[i, : lengths[i]]))
    # byte split round-trips the words exactly
    by = np.asarray(words_to_bytes(jnp.asarray(words)))
    np.testing.assert_array_equal(by, data)
