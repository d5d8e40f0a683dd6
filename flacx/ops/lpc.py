"""Batched LPC analysis: window → autocorrelation → all-order
Levinson-Durbin → error-feedback quantization → integer residuals.

TPU-first restructuring of reference flac/encoder.py:362-534:

* the reference re-runs the Levinson recursion from scratch for every
  candidate order (flac/encoder.py:374-375); here one ``lax.scan`` over the
  recursion step yields *every* order's coefficients in a single sweep,
* quantization's sequential error feedback becomes a second short scan over
  the 32 tap positions, vectorised over all (batch, order) lanes at once,
* analysis floats are f64 (numerically faithful to the CPython reference;
  the FLOP count here is negligible next to the Rice/bit-pack stages),
* residuals stay exact int64 — the analysis floats only influence *which*
  coefficients are chosen, never round-trip correctness (SURVEY.md §2.4).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flacx.oracle.analyze import tukey_window


@lru_cache(maxsize=None)
def tukey_window_np(n: int, r: float = 0.5) -> np.ndarray:
    """Window constants (f64), identical to the oracle/reference formula."""
    return np.asarray(tukey_window(n, r), dtype=np.float64)


@lru_cache(maxsize=None)
def apodization_window_np(name: str, n: int) -> np.ndarray:
    """Apodization window constants by libFLAC-style name (f64, host).

    The reference hardcodes Tukey(0.5) (flac/encoder.py:423-440, itself a
    port of libFLAC's ``FLAC__window_tukey``); flacx accepts a window LIST
    per libFLAC's ``-A`` and picks the best per (frame, channel, order) by
    predicted residual size.  Supported: ``tukey(P)`` (default P=0.5),
    ``hann``, ``rectangle``, ``triangle``, ``welch``, ``blackman``,
    ``nuttall``, ``flattop``, ``gauss(STDDEV)`` — the libFLAC formulas
    over ``N-1``.

    >>> bool(np.all(apodization_window_np("rectangle", 4) == 1.0))
    True
    >>> np.allclose(apodization_window_np("tukey(0.5)", 64),
    ...             tukey_window_np(64))
    True
    """
    import re

    m = re.fullmatch(r"([a-z_]+)(?:\(([^()]*)\))?", name.strip().lower())
    if not m:
        raise ValueError(f"bad apodization window {name!r}")
    kind, arg = m.group(1), m.group(2)
    i = np.arange(n, dtype=np.float64)
    d = max(n - 1, 1)
    if kind == "tukey":
        return tukey_window_np(n, float(arg) if arg else 0.5)
    if arg is not None and kind != "gauss":
        raise ValueError(f"window {kind!r} takes no parameter")
    if kind == "rectangle":
        return np.ones(n, np.float64)
    if kind == "hann":
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / d)
    if kind == "triangle":
        return 1.0 - np.abs(2.0 * i - d) / d
    if kind == "welch":
        t = (2.0 * i - d) / d
        return 1.0 - t * t
    if kind == "blackman":
        x = 2.0 * np.pi * i / d
        return 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2.0 * x)
    if kind == "nuttall":
        x = 2.0 * np.pi * i / d
        return (0.3635819 - 0.4891775 * np.cos(x)
                + 0.1365995 * np.cos(2.0 * x) - 0.0106411 * np.cos(3.0 * x))
    if kind == "flattop":
        x = 2.0 * np.pi * i / d
        return (1.0 - 1.93 * np.cos(x) + 1.29 * np.cos(2.0 * x)
                - 0.388 * np.cos(3.0 * x) + 0.0322 * np.cos(4.0 * x))
    if kind == "gauss":
        s = float(arg) if arg else 0.25
        if not 0.0 < s <= 0.5:
            raise ValueError("gauss stddev must be in (0, 0.5]")
        t = (2.0 * i - d) / d
        return np.exp(-0.5 * (t / s) ** 2)
    raise ValueError(f"unknown apodization window {kind!r}")


def autocorrelate(w: jnp.ndarray, max_lag: int,
                  use_tile_kernel: bool | None = None,
                  window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Autocorrelation for lags ``0..max_lag`` over the last axis.

    Keeps the reference's summation range (drops the last product,
    flac/encoder.py:443-450) so coefficient choices track the oracle.
    Products use the input dtype (f32 is fine); accumulation is always
    f64 — the Levinson recursion amplifies accumulation error but not
    per-product rounding.  Returns ``[..., max_lag+1]`` f64.

    ``window``: optional ``[n]`` apodization window.  When given, ``w``
    is the RAW signal and the window multiply happens inside the Pallas
    kernel (neither the windowed signal nor its transpose is ever
    materialized in HBM; drop-last is folded into the window constant).

    ``use_tile_kernel`` routes f32 inputs through the single-pass Pallas
    kernel (``flacx.kernels.autocorr_tile``) instead of one XLA fusion
    per lag; None = auto (TPU backend only).  The kernel keeps f64
    cross-tile accumulation; within a 512-sample tile partial sums are
    f32 pairwise — the same rounding class as the f32 products
    themselves, so coefficient choices are unchanged in practice (and
    always revalidated by the exact integer residuals).
    """
    n = w.shape[-1]
    if use_tile_kernel is None:
        use_tile_kernel = jax.default_backend() == "tpu"
    lead = w.shape[:-1]
    r = 1
    for d in lead:
        r *= d
    if (use_tile_kernel and w.dtype in (jnp.float32, jnp.int32)
            and max_lag < 63 and r % 128 == 0 and n >= 2):
        # int32 signals pass straight through — the f32 conversion (and
        # the window multiply) happen inside the kernel, so neither the
        # f32 copy nor a [R, N] reshape is ever materialized in HBM; 3D
        # [B, V, N] inputs keep their layout via a 3D block spec
        from flacx.kernels.autocorr_tile import autocorr_tiled
        v = w if (w.ndim == 3 and 128 % w.shape[1] == 0) \
            else w.reshape(r, n)
        if window is None:
            if v.dtype == jnp.int32:
                v = v.at[..., n - 1].set(0)     # drop-last-product range
            else:
                v = v.at[..., n - 1].set(0.0)
            win = None
        else:
            win = window.astype(jnp.float32).at[n - 1].set(0.0)
        return autocorr_tiled(v, max_lag, window=win
                              ).reshape(*lead, max_lag + 1)
    if w.dtype == jnp.int32:
        w = w.astype(jnp.float32)
    if window is not None:
        w = w * window.astype(w.dtype)
    cols = [jnp.sum(w[..., : n - lag - 1] * w[..., lag: n - 1], axis=-1,
                    dtype=jnp.float64)
            for lag in range(max_lag + 1)]
    return jnp.stack(cols, axis=-1)


def levinson_all_orders(autoc: jnp.ndarray, max_order: int,
                        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin for every order ``1..max_order`` in one scan.

    Args:
      autoc: ``[..., max_order+1]`` f64 autocorrelation values.
    Returns:
      ``(taps, errors, valid)`` — taps ``[..., max_order, max_order]`` f64
      (row ``o-1`` holds the order-``o`` predictor, zero-padded), the
      per-order prediction error power (used by the estimate-mode order
      search, the same shortcut libFLAC's fast presets use), and a
      validity mask ``[..., max_order]`` (False once the recursion
      degenerates, e.g. digital silence where the reference raises
      ZeroDivisionError, flac/encoder.py:469 / SURVEY.md §2.3.2).
    """
    p = max_order
    lead = autoc.shape[:-1]
    pos = jnp.arange(p + 1)

    a0 = jnp.zeros((*lead, p + 1), jnp.float64).at[..., 0].set(1.0)
    err0 = autoc[..., 0]
    ok0 = jnp.ones(lead, bool)

    def step(carry, k):
        a, err, ok = carry
        rev_idx = jnp.clip(k + 1 - pos, 0, p)
        av = jnp.take(autoc, rev_idx, axis=-1)
        ok = ok & (err > 0.0)
        lam = -jnp.sum(a * av, axis=-1) / jnp.where(err > 0.0, err, 1.0)
        lam = jnp.where(ok, lam, 0.0)
        arev = jnp.take(a, rev_idx, axis=-1)
        upd_mask = (pos <= k + 1).astype(a.dtype)
        a = a + lam[..., None] * arev * upd_mask
        err = err * (1.0 - lam * lam)
        return (a, err, ok), (a, err, ok)

    (_, _, _), (a_hist, err_hist, ok_hist) = jax.lax.scan(
        step, (a0, err0, ok0), jnp.arange(p), unroll=True)

    # a_hist: [p, *lead, p+1] -> [*lead, p, p]
    taps = jnp.moveaxis(a_hist, 0, -2)[..., 1:]
    errors = jnp.moveaxis(err_hist, 0, -1)
    valid = jnp.moveaxis(ok_hist, 0, -1)
    valid = valid & jnp.all(jnp.isfinite(taps), axis=-1)
    return taps, errors, valid


def quantize_all_orders(taps: jnp.ndarray, precision: int,
                        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Error-feedback quantization for every order's tap set at once.

    Mirrors oracle ``quantize_coefficients`` (itself libFLAC's algorithm,
    reference flac/encoder.py:482-534 with the negative-shift defect fixed):
    ``shift = precision - floor(log2(max|c|)) - 2`` clamped to the 5-bit
    field, sequential round-half-even with running error.

    Args:
      taps: ``[..., orders, taps]`` f64.
    Returns:
      ``(qcoefs i32, shifts i32, valid bool)`` with shapes
      ``[..., orders, taps]``, ``[..., orders]``, ``[..., orders]``.
    """
    p = taps.shape[-1]
    cmax = jnp.max(jnp.abs(taps), axis=-1)
    finite = jnp.isfinite(cmax) & (cmax > 0.0)
    safe_cmax = jnp.where(finite, cmax, 1.0)
    shift = precision - jnp.floor(jnp.log2(safe_cmax)).astype(jnp.int32) - 2
    shift = jnp.clip(shift, -32, 15)
    scale = jnp.exp2(shift.astype(jnp.float64))
    emitted_shift = jnp.maximum(shift, 0)

    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))

    def step(err, t):
        err = err + taps[..., t] * scale
        q = jnp.clip(jnp.rint(err), qmin, qmax)
        err = err - q
        return err, q.astype(jnp.int32)

    _, qs = jax.lax.scan(step, jnp.zeros(taps.shape[:-1], jnp.float64),
                         jnp.arange(p), unroll=True)
    qcoefs = jnp.moveaxis(qs, 0, -1)

    # zero out taps beyond each row's order (row o-1 ⇒ order o)
    order = jnp.arange(1, taps.shape[-2] + 1)
    tap_mask = jnp.arange(p) < order[:, None]
    qcoefs = jnp.where(tap_mask, qcoefs, 0)
    return qcoefs, emitted_shift.astype(jnp.int32), finite


def shift_right_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x[..., i] -> x[..., i-k], zero-filled."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad)[..., :-k] if k else x


def predict_residual(x: jnp.ndarray, taps: jnp.ndarray,
                     shift: jnp.ndarray, acc_dtype=jnp.int64) -> jnp.ndarray:
    """Exact integer residual ``x[i] - (Σ_j taps_j·x[i-1-j] >> shift)``.

    Args:
      x: ``[..., n]`` integer samples.
      taps: ``[..., T]`` int taps (zero beyond the true order).
      shift: ``[...]`` int arithmetic right shift.
      acc_dtype: accumulator dtype.  int64 is always exact (SURVEY.md
        §2.4) but is *emulated* as u32 pairs on TPU (~4× the VPU work and
        HBM traffic); callers whose static bound
        ``bps_eff + 1 + ceil(log2(Σ|taps|_max))`` fits 31 bits pass int32
        — bit-identical by construction, and this MAC is the single
        hottest fusion of the encode pipeline (16.6 of 33 ms at batch
        1024 when run as int64).
    Returns:
      ``[..., n]`` acc_dtype (positions ``i < order`` hold junk; mask by
      order).

    Parity: reference flac/encoder.py:537-548.
    """
    xa = x.astype(acc_dtype)
    t = taps.shape[-1]
    acc = jnp.zeros_like(xa)
    for j in range(t):
        acc = acc + (taps[..., j, None].astype(acc_dtype)
                     * shift_right_k(xa, j + 1))
    pred = jnp.right_shift(acc, shift[..., None].astype(acc_dtype))
    return xa - pred


def lpc_residuals_all(x: jnp.ndarray, qcoefs: jnp.ndarray,
                      shifts: jnp.ndarray, acc_dtype=jnp.int64) -> jnp.ndarray:
    """Exact residuals for every LPC order.

    Args:
      x: ``[..., n]`` int samples; qcoefs ``[..., P, P]``; shifts ``[..., P]``.
      acc_dtype: see :func:`predict_residual` (same static bound).
    Returns:
      ``[..., P, n]`` acc_dtype; row ``o-1`` valid at positions ``i >= o``.
    """
    p = qcoefs.shape[-2]
    xa = x.astype(acc_dtype)
    shifted = [shift_right_k(xa, j + 1) for j in range(p)]
    rows = []
    for o in range(1, p + 1):
        acc = jnp.zeros_like(xa)
        for j in range(o):
            acc = acc + (qcoefs[..., o - 1, j, None].astype(acc_dtype)
                         * shifted[j])
        pred = jnp.right_shift(acc, shifts[..., o - 1, None].astype(acc_dtype))
        rows.append(xa - pred)
    return jnp.stack(rows, axis=-2)


def predict_residual_fused(x: jnp.ndarray, taps: jnp.ndarray,
                           shift: jnp.ndarray, order: jnp.ndarray,
                           eff_bps: int, sum_taps_max: int,
                           use_tile_kernel: bool | None = None,
                           stats_only: bool = False,
                           ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked LPC residual + its two selection statistics, fused.

    Returns ``(res, lzz, maxabs)`` where ``res`` is
    :func:`predict_residual` with positions ``i < order`` zeroed,
    ``lzz = Σ zigzag(res)`` (int64) and ``maxabs = max |res|`` (int32) —
    the cross-family ranking sum and int32-eligibility statistic the
    encoder derives from the residual (reference ranking basis:
    flac/encoder.py:374-390).

    ``stats_only=True`` returns ``(None, lzz, maxabs)`` and, on the
    kernel path, never writes the residual to HBM (the encoder's fused
    emit recomputes it in VMEM, ``flacx.kernels.lpcres_tile``).

    ``use_tile_kernel`` routes through the single-HBM-pass Pallas kernel
    (``flacx.kernels.lpcres_tile``); None = auto (TPU, rows a multiple
    of 128, and either the int32 MAC + int32 zigzag-partial exactness
    gates derived from ``eff_bps`` and the static tap-magnitude bound
    ``sum_taps_max = P · 2^(prec-1)``, or — stats-only — the two-limb
    split-int32 MAC gate).  Paths are bit-identical in every value the
    encoder consumes: on lanes past the int32-eligibility threshold
    (``maxabs ≥ 2^30``, discarded by the caller) the split path reports
    a different-but-also-``≥ 2^30`` maxabs and unused lzz.
    """
    import jax

    n = x.shape[-1]
    lead = x.shape[:-1]
    r = 1
    for d in lead:
        r *= d
    t = taps.shape[-1]
    int32_ok = (eff_bps + 1 + max(1, sum_taps_max).bit_length() <= 31
                and (1 + sum_taps_max) < (1 << max(25 - eff_bps, 0)))
    from flacx.kernels.lpcres_tile import split_mac_ok
    # two-limb int32 MAC + split zigzag partials: covers the hi-res
    # widths (24-bit / order 32) the single-int32 gates exclude, with
    # selection bit-identical to the int64 arithmetic (overflow lanes
    # are flagged past the caller's 2^30 discard threshold — see
    # flacx.kernels.lpcres_tile._mac_rows)
    split = (not int32_ok) and split_mac_ok(eff_bps, sum_taps_max)
    if use_tile_kernel is None:
        use_tile_kernel = (
            jax.default_backend() == "tpu" and r % 128 == 0
            and t <= 32 and n >= 1
            and (int32_ok or (split and stats_only)))
    if use_tile_kernel and stats_only:
        from flacx.kernels.lpcres_tile import lpc_residual_stats
        xin = x.astype(jnp.int32)
        if not (xin.ndim == 3 and 128 % xin.shape[1] == 0):
            xin = xin.reshape(r, n)
        lzz, maxabs = lpc_residual_stats(
            xin, taps.astype(jnp.int32).reshape(r, t),
            shift.astype(jnp.int32).reshape(r),
            order.astype(jnp.int32).reshape(r), split=split)
        return None, lzz.reshape(lead), maxabs.reshape(lead)
    if use_tile_kernel:
        from flacx.kernels.lpcres_tile import lpc_residual_tiles
        out_lead = (lead if len(lead) == 2 and 128 % lead[1] == 0
                    else None)
        res, lzz, maxabs = lpc_residual_tiles(
            x.astype(jnp.int32).reshape(r, n),
            taps.astype(jnp.int32).reshape(r, t),
            shift.astype(jnp.int32).reshape(r),
            order.astype(jnp.int32).reshape(r), out_lead=out_lead)
        if out_lead is None:
            res = res.reshape(*lead, n)
        return res, lzz.reshape(lead), maxabs.reshape(lead)

    from flacx.ops.rice import zigzag

    acc_dtype = (jnp.int32
                 if eff_bps + 1 + max(1, sum_taps_max).bit_length() <= 31
                 else jnp.int64)
    res = predict_residual(x, taps, shift, acc_dtype)
    i_pos = jnp.arange(n, dtype=jnp.int32)
    res = res * (i_pos >= order[..., None])
    lzz = jnp.sum(zigzag(res), axis=-1, dtype=jnp.int64)
    # clamp before narrowing: an int64 |res| ≥ 2^31 must stay ≥ 2^30
    # after the cast so the caller's eligibility compare is preserved
    maxabs = jnp.minimum(jnp.max(jnp.abs(res), axis=-1),
                         (1 << 31) - 1).astype(jnp.int32)
    return res, lzz, maxabs
