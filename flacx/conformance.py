"""Reference-conformance DEVICE encode mode (byte-compat proof).

``EncoderConfig(conformance=True)`` makes the batched device pipeline
reproduce the reference encoder's parameter choices exactly, so its
frames are byte-identical to the oracle encoder's — and the oracle is
proven byte-identical to the reference on valid inputs
(``tests/test_oracle_codec.py::test_byte_identical_with_reference*``).
This closes the north-star claim "emits FLAC files byte-compatible with
the reference's parameter choices" for the device path itself
(VERDICT round-2 item 6).

What the reference does (and this mode replicates, on device):

* independent channels, no wasted bits, no escapes, no verbatim;
  constant blocks become Constant subframes (the oracle's documented
  defect fix — the reference crashes on them, SURVEY.md §2.3.2),
* fixed vs LPC selection by the sum-of-abs-residual magnitude heuristic
  with first-minimum ties (flac/encoder.py:127-157; tie → fixed per the
  oracle's defect fix for the reference's ``assert False``),
* f64 LPC analysis with CPython-identical float sequencing: the Tukey
  window from ``math.cos`` (shared with the oracle), autocorrelation as
  strict left-to-right sums including the reference's drop-last-product
  range (flac/encoder.py:443-450), the Levinson-Durbin recursion with
  the reference's exact operation order (flac/encoder.py:453-479), and
  error-feedback quantization with CPython ``floor(log2(.))`` semantics
  (flac/encoder.py:482-534),
* the mean-estimate Rice parameter ``floor(log2(total/count))`` clamped
  to [0, 30] and the reference's partition-size estimate
  ``Σ 4 + width_p + exact_cost(param_p)`` with first-minimum partition
  order (flac/encoder.py:632-753; all-zero partitions → parameter 0 and
  the 5-bit clamp, the oracle's defect fixes).

The float replication notes: every elementwise f64 op (mul, add, div)
is IEEE-deterministic and matches CPython bit-for-bit as long as no
FMA contraction merges a mul+add pair; sums are sequenced exactly as
the reference's Python loops.  ``floor(log2(x))`` is the one libm call
— replicated from the f64 exponent with a correction for the
measure-zero case where a correctly-rounded ``log2`` lands exactly on
the next integer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import flacx.ops  # noqa: F401  (x64)
from flacx.format import FIXED_PREDICTOR_TAPS, INDEPENDENT_CHANNELS
from flacx.ops import emit
from flacx.ops.bitpack import pack_symbols_words, words_to_bytes
from flacx.ops.crcfold import crc16_over_word_rows
from flacx.ops.headers import frame_header_symbols
from flacx.ops.lpc import lpc_residuals_all, predict_residual, tukey_window_np
from flacx.ops.rice import RicePlan

_INF64 = jnp.int64(1) << 60
_BIAS = jnp.int64(1) << 40


def floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """CPython ``floor(math.log2(x))`` for positive finite f64 ``x``.

    The f64 exponent gives ``floor(log2(x))`` directly except when the
    correctly-rounded ``log2(x)`` lands exactly on the NEXT integer —
    x a hair under a power of two, where the true value is within half
    an ulp of that integer (parity target: flac/encoder.py:520,749 via
    glibc's correctly-rounded log2).
    """
    mant, expo = jnp.frexp(x)                       # x = mant·2^e, mant∈[.5,1)
    # log2(x) = e - δ with δ = -log2(mant) ∈ (0, 1]; rounds to e iff
    # δ < ulp(e)/2 (e ≠ 0 — near 0 the result ulp is tiny)
    delta = -jnp.log1p(mant - 1.0) / jnp.log(jnp.float64(2.0))
    ae = jnp.abs(expo).astype(jnp.float64)
    half_ulp = jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(ae, 1.0))) - 53.0)
    rounds_up = (expo != 0) & (delta < half_ulp)
    return (expo - 1 + rounds_up.astype(expo.dtype)).astype(jnp.int32)


def ordered_autocorr(w: jnp.ndarray, max_lag: int,
                     unroll: int = 16) -> jnp.ndarray:
    """Strict left-to-right autocorrelation sums (CPython float order).

    ``out[..., lag] = Σ_{j=0}^{n-lag-2} w_j·w_{j+lag}`` with the terms
    added in exactly the reference's loop order (flac/encoder.py:443-450
    including its off-by-one range), so the f64 results are
    bit-identical to the oracle's.  Masked terms add ``+0.0`` which
    cannot change any partial sum (the accumulator never becomes -0.0).
    """
    n = w.shape[-1]
    lead = w.shape[:-1]
    nl = max_lag + 1
    lags = jnp.arange(nl)
    wp = jnp.pad(w, [(0, 0)] * len(lead) + [(0, nl)])

    def step(acc, j):
        win = jax.lax.dynamic_slice_in_dim(wp, j, nl, axis=-1)
        wj = jax.lax.dynamic_slice_in_dim(w, j, 1, axis=-1)
        term = jnp.where(j + lags <= n - 2, wj * win, 0.0)
        return acc + term, None

    acc0 = jnp.zeros((*lead, nl), jnp.float64)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n - 1), unroll=unroll)
    return acc


def levinson_reference(autoc: jnp.ndarray, max_order: int,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's Levinson-Durbin, exact op order, all orders.

    The reference re-runs the recursion from scratch per target order
    (flac/encoder.py:374-375), but every run executes the identical
    float ops over the shared autocorrelation prefix, so one sequential
    recursion with per-order snapshots reproduces all of them
    bit-for-bit.  Inner sums are sequenced exactly like the Python
    loops (lam accumulated by successive subtraction; the symmetric
    update from pre-update values).

    Returns ``(taps [..., P, P] f64, valid [..., P] bool)`` — row o-1
    holds the order-o coefficients ``a[1:]``; ``valid`` goes False when
    the recursion hits a zero error (the reference raises
    ZeroDivisionError there, SURVEY.md §2.3.2).
    """
    lead = autoc.shape[:-1]
    p = max_order
    a = [jnp.zeros(lead, jnp.float64) for _ in range(p + 1)]
    a[0] = jnp.ones(lead, jnp.float64)
    err = autoc[..., 0]
    ok = jnp.ones(lead, bool)
    rows, valids = [], []
    for k in range(p):
        ok = ok & (err != 0.0)
        safe_err = jnp.where(err != 0.0, err, 1.0)
        lam = jnp.zeros(lead, jnp.float64)
        for j in range(k + 1):
            lam = lam - a[j] * autoc[..., k + 1 - j]
        lam = lam / safe_err
        for i in range((k + 1) // 2 + 1):
            tmp = a[k + 1 - i] + lam * a[i]
            a[i] = a[i] + lam * a[k + 1 - i]
            a[k + 1 - i] = tmp
        err = err * (1.0 - lam ** 2)
        row = jnp.stack([a[j] for j in range(1, p + 1)], axis=-1)
        mask = (jnp.arange(p) <= k).astype(row.dtype)
        rows.append(row * mask)
        valids.append(ok)
    taps = jnp.stack(rows, axis=-2)
    valid = jnp.stack(valids, axis=-1)
    valid = valid & jnp.all(jnp.isfinite(taps), axis=-1)
    return taps, valid


def quantize_reference(taps: jnp.ndarray, precision: int,
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Error-feedback quantization, CPython-exact (flac/encoder.py:482-534
    with the oracle's negative-shift defect fix).

    Args: taps ``[..., P, P]`` f64 (row o-1 zero beyond order o).
    Returns ``(qcoefs i32 [..., P, P], shift i32 [..., P])``.
    """
    p = taps.shape[-1]
    cmax = jnp.max(jnp.abs(taps), axis=-1)
    pos = cmax > 0.0
    shift = precision - floor_log2(jnp.where(pos, cmax, 1.0)) - 2
    shift = jnp.minimum(shift, 15)
    # negative shift: scale down, emit shift 0 (oracle defect fix)
    scale = jnp.where(shift >= 0, jnp.exp2(shift.astype(jnp.float64)),
                      1.0 / jnp.exp2(-shift.astype(jnp.float64)))
    out_shift = jnp.where(pos, jnp.maximum(shift, 0), 0)

    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    err = jnp.zeros(taps.shape[:-1], jnp.float64)
    qs = []
    for j in range(p):
        err = err + taps[..., j] * scale
        q = jnp.clip(jnp.rint(err), qmin, qmax)
        err = err - q
        qs.append(q.astype(jnp.int32))
    qcoefs = jnp.stack(qs, axis=-1)
    order = jnp.arange(1, p + 1)
    tap_mask = jnp.arange(p) < order[:, None]
    qcoefs = jnp.where(tap_mask, qcoefs, 0)
    qcoefs = jnp.where(pos[..., None], qcoefs, 0)
    return qcoefs, out_shift.astype(jnp.int32)


def reference_rice_plan(zz: jnp.ndarray, order: jnp.ndarray,
                        porders: tuple[int, ...],
                        preferred: tuple[int, ...]) -> RicePlan:
    """The reference's Rice planning (flac/encoder.py:632-753), batched.

    Per partition: parameter = ``floor(log2(total/count))`` mean
    estimate (0 for all-zero or sub-unity means; clamped to [0, 30] —
    the oracle's defect fixes), cost = the exact bit size at that
    parameter; partition order = first minimum of
    ``Σ 4 + width_p + cost_p`` over the requested orders ascending.
    Method width: 4-bit iff every chosen parameter ≤ 14.
    ``zz`` int64 ``[..., n]`` (zeros at warmup positions).
    """
    n = zz.shape[-1]
    lead = zz.shape[:-1]
    max_po = max(porders)
    kmax = 30
    ks = jnp.arange(kmax + 1, dtype=jnp.int64)

    nparts_f = 1 << max_po
    zzr = zz.reshape(*lead, nparts_f, n >> max_po)
    s = jnp.stack([jnp.sum(zzr >> k, axis=-1, dtype=jnp.int64)
                   for k in range(kmax + 1)], axis=-1)
    s_by_po = {max_po: s}
    for po in range(max_po, 0, -1):
        s_by_po[po - 1] = (s_by_po[po][..., 0::2, :]
                           + s_by_po[po][..., 1::2, :])

    best_est = jnp.full(lead, _INF64)
    best_po = jnp.zeros(lead, jnp.int32)
    k_levels = {}
    for po in porders:
        nparts = 1 << po
        psize = n >> po
        sp = s_by_po[po]                      # [..., nparts, kmax+1]
        is_p0 = (jnp.arange(nparts) == 0)
        cnt = (psize - order[..., None] * is_p0).astype(jnp.int64)
        total = sp[..., 0]
        mean = total.astype(jnp.float64) / cnt.astype(jnp.float64)
        param = jnp.clip(floor_log2(jnp.maximum(mean, 1.0)), 0, 30)
        param = jnp.where((total == 0) | (total < cnt), 0, param)
        k_levels[po] = param
        cost = (jnp.take_along_axis(sp, param[..., None].astype(jnp.int64),
                                    axis=-1)[..., 0]
                + (param.astype(jnp.int64) + 1) * cnt)
        est = jnp.sum(4 + jnp.where(param > 14, 5, 4).astype(jnp.int64)
                      + cost, axis=-1)
        bias = jnp.int64(0) if po in preferred else _BIAS
        est = jnp.where(psize > order, est + bias, _INF64)
        take = est < best_est                 # strict: ascending first-min
        best_po = jnp.where(take, po, best_po)
        best_est = jnp.minimum(est, best_est)

    # chosen-order per-partition params -> width, per-sample expansion
    width = jnp.full(lead, 4, jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    k_sample = jnp.zeros((*lead, n), jnp.int8)
    param_start = jnp.zeros((*lead, n), bool)
    psize_min = n >> max_po
    ppos = sorted(set(range(min(33, n))) | set(range(0, n, psize_min)))
    np_ppos = np.asarray(ppos, np.int32)
    k_param = jnp.zeros((*lead, len(ppos)), jnp.int8)
    start_param = jnp.zeros((*lead, len(ppos)), bool)
    for po in porders:
        nparts = 1 << po
        psize = n >> po
        here = (best_po == po)[..., None]
        args = k_levels[po].astype(jnp.int8)
        width = jnp.where(
            (best_po == po) & (jnp.max(args, axis=-1) > 14), 5, width)
        expand = jnp.broadcast_to(
            args[..., None], (*lead, nparts, psize)).reshape(*lead, n)
        starts = ((i % psize == 0) & (i > 0)) | (i == order[..., None])
        k_sample = jnp.where(here, expand, k_sample)
        param_start = jnp.where(here, starts, param_start)
        part_of = jnp.asarray(np_ppos // psize, jnp.int32)
        k_param = jnp.where(here, args[..., part_of], k_param)
        sp_ = ((jnp.asarray(np_ppos % psize == 0) & jnp.asarray(np_ppos > 0))
               | (jnp.asarray(np_ppos) == order[..., None]))
        start_param = jnp.where(here, sp_, start_param)

    # finest-grid copy (see rice.RicePlan.k_seg)
    nseg = 1 << max_po
    k_seg = jnp.zeros((*lead, nseg), jnp.int8)
    for po in porders:
        here = (best_po == po)[..., None]
        seg_of = jnp.asarray(
            np.arange(nseg, dtype=np.int32) >> (max_po - po), jnp.int32)
        k_seg = jnp.where(here, k_levels[po].astype(jnp.int8)[..., seg_of],
                          k_seg)

    no_esc = jnp.zeros((*lead, n), bool)
    no_esc_p = jnp.zeros((*lead, len(ppos)), bool)
    est_out = best_est - jnp.where(best_est >= _BIAS, _BIAS, 0)
    return RicePlan(bits=est_out, porder=best_po, width=width,
                    k_sample=k_sample, param_start=param_start,
                    esc_sample=no_esc, k_param=k_param,
                    start_param=start_param, esc_param=no_esc_p,
                    k_seg=k_seg, esc_seg=jnp.zeros((*lead, nseg), bool))


def encode_batch_conformance(cfg, pcm: jnp.ndarray,
                             frame_index: jnp.ndarray) -> dict:
    """Reference-choice device encode: pcm ``[B, C, N]`` → packed frames.

    Same output contract as ``flacx.encoder._encode_batch``; every
    parameter choice matches the oracle encoder (and therefore the
    reference) bit-for-bit.
    """
    n = cfg.block_size
    b = pcm.shape[0]
    c = cfg.channels
    p = cfg.max_lpc_order
    t = cfg.max_taps
    prec = cfg.qlp_precision

    x = pcm.astype(jnp.int32)                          # [B, C, N]
    i_pos = jnp.arange(n, dtype=jnp.int32)
    bps_c = jnp.full((b, c), cfg.bps, jnp.int32)

    # ---- fixed analysis: min Σ|res| over orders 0..4, first-min wins
    taps5 = jnp.asarray(FIXED_PREDICTOR_TAPS)          # [5, 4]
    fixed_res = []
    fixed_err = []
    for o in range(5):
        res_o = predict_residual(x, jnp.broadcast_to(taps5[o], (b, c, 4)),
                                 jnp.zeros((b, c), jnp.int32), jnp.int64)
        res_o = res_o * (i_pos >= o)
        fixed_res.append(res_o)
        fixed_err.append(jnp.sum(jnp.abs(res_o), axis=-1, dtype=jnp.int64))
    ferr = jnp.stack(fixed_err, axis=-1)               # [B, C, 5]
    f_order = jnp.argmin(ferr, axis=-1).astype(jnp.int32)
    f_err = jnp.min(ferr, axis=-1)

    # ---- LPC analysis: CPython-exact f64 chain, min Σ|res| over orders
    use_lpc_path = p >= 1 and n >= 9
    if use_lpc_path:
        win = jnp.asarray(tukey_window_np(n))
        wsig = x.astype(jnp.float64) * win
        autoc = ordered_autocorr(wsig, min(p, n - 1))
        taps_f, valid_ld = levinson_reference(autoc, min(p, n - 1))
        qcoefs, qshift = quantize_reference(taps_f, prec)
        lres = lpc_residuals_all(x, qcoefs, qshift, jnp.int64)
        pe = min(p, n - 1)
        lmask = i_pos >= jnp.arange(1, pe + 1)[:, None]
        lres = lres * lmask
        lerr = jnp.sum(jnp.abs(lres), axis=-1, dtype=jnp.int64)
        lerr = jnp.where(valid_ld, lerr, _INF64)
        lpc_dead = autoc[..., 0] == 0.0                # digital silence
        lerr = jnp.where(lpc_dead[..., None], _INF64, lerr)
        l_order0 = jnp.argmin(lerr, axis=-1).astype(jnp.int32)
        l_err = jnp.min(lerr, axis=-1)
        lpc_ok = l_err < _INF64
        is_lpc = lpc_ok & (l_err < f_err)              # tie → fixed
        lpc_order = l_order0 + 1

        def sel(arr, idx):
            cases = [arr[..., k, :] for k in range(arr.shape[-2])]
            which = jnp.broadcast_to(idx[..., None], cases[0].shape)
            return jax.lax.select_n(which, *cases)

        taps_lpc = sel(qcoefs, l_order0)               # [B, C, P]
        shift_lpc = jnp.take_along_axis(
            qshift, l_order0[..., None], axis=-1)[..., 0]
        res_lpc = sel(lres, l_order0)
    else:
        is_lpc = jnp.zeros((b, c), bool)
        lpc_order = jnp.ones((b, c), jnp.int32)
        taps_lpc = jnp.zeros((b, c, max(p, 1)), jnp.int32)
        shift_lpc = jnp.zeros((b, c), jnp.int32)
        res_lpc = jnp.zeros((b, c, n), jnp.int64)

    # ---- selection (constant > heuristic fixed/LPC; never verbatim)
    const_sel = jnp.all(x == x[..., :1], axis=-1)
    order = jnp.where(is_lpc, lpc_order, f_order)
    kind = jnp.where(const_sel, emit.KIND_CONSTANT,
                     jnp.where(is_lpc, emit.KIND_LPC, emit.KIND_FIXED))

    res_fix = jnp.zeros((b, c, n), jnp.int64)
    for o in range(5):
        res_fix = jnp.where(f_order[..., None] == o, fixed_res[o], res_fix)
    res = jnp.where(is_lpc[..., None], res_lpc, res_fix)

    taps_fix = jnp.pad(taps5[f_order], ((0, 0), (0, 0), (0, t - 4)))
    if use_lpc_path and taps_lpc.shape[-1] < t:
        taps_lpc = jnp.pad(
            taps_lpc, ((0, 0), (0, 0), (0, t - taps_lpc.shape[-1])))
    taps = jnp.where(is_lpc[..., None], taps_lpc, taps_fix)
    shift = jnp.where(is_lpc, shift_lpc, 0).astype(jnp.int32)

    # ---- reference Rice plan on the chosen residual
    from flacx.ops.rice import zigzag
    zz = zigzag(res) * (i_pos >= order[..., None])
    plan = reference_rice_plan(zz, order, cfg.porders,
                               cfg.preferred_porders)

    # ---- packer-capacity guard: the merge-tree packer emits each Rice
    # code as ONE ≤32-bit symbol; the reference's unary quotients are
    # unbounded (flac/encoder.py:798-806), so a frame whose mean-estimate
    # parameter leaves any code over 32 bits cannot be packed on device —
    # flag it and let the host re-encode it via the oracle (bit-identical
    # by the oracle's own parity proof).
    k64 = plan.k_sample.astype(jnp.int64)
    code_len = (zz >> k64) + 1 + k64
    in_resid = (kind >= emit.KIND_FIXED)[..., None] & (i_pos
                                                       >= order[..., None])
    overflow = jnp.any(in_resid & (code_len > 32), axis=(1, 2))

    # ---- emission (classic path; layout identical to the oracle writer)
    indices = (frame_index + jnp.arange(b, dtype=jnp.int64)
               if frame_index.ndim == 0 else frame_index.astype(jnp.int64))
    ch_code = jnp.full((b,), int(INDEPENDENT_CHANNELS[c]), jnp.int32)
    hdr = frame_header_symbols(indices, ch_code, n)
    psize_min = n >> max(cfg.porders)
    sv, sl = emit.subframe_symbols(kind, order, bps_c, x, taps, shift,
                                   prec, zz, plan, psize_min=psize_min)
    sv = sv.reshape(b, -1)
    sl = sl.reshape(b, -1)
    body_bits = (jnp.sum(hdr.lengths, axis=-1)
                 + jnp.sum(sl, axis=-1, dtype=jnp.int64)).astype(jnp.int32)
    pad = (-body_bits) % 8
    values = jnp.concatenate(
        [hdr.values, sv, jnp.zeros((b, 1), jnp.uint32)], axis=-1)
    lengths = jnp.concatenate([hdr.lengths, sl, pad[:, None]], axis=-1)
    frame_words, total_bits = pack_symbols_words(values, lengths,
                                                 cfg.max_frame_bytes)
    nbytes = total_bits // 8
    crc = crc16_over_word_rows(frame_words, nbytes)
    frame_bytes = words_to_bytes(frame_words)
    posb = jnp.arange(cfg.max_frame_bytes, dtype=jnp.int32)
    frame_bytes = jnp.where(posb == nbytes[:, None],
                            (crc[:, None] >> 8).astype(jnp.uint8),
                            frame_bytes)
    frame_bytes = jnp.where(posb == (nbytes + 1)[:, None],
                            (crc[:, None] & 0xFF).astype(jnp.uint8),
                            frame_bytes)
    return {
        "bytes": frame_bytes,
        "length": nbytes + 2,
        "kind": kind,
        "channel_code": ch_code,
        "subframe_bits": jnp.zeros((b, c), jnp.int64),
        "overflow": overflow,
    }
