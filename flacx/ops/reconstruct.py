"""Batched predictor reconstruction (decode side).

The IIR ``x[i] = r[i] + (Σ_j c_j·x[i-1-j] >> shift)`` is sequential in i
(reference flac/decoder.py:493-498) but embarrassingly parallel across
subframes: a single ``lax.scan`` over the sample axis advances every
``[batch, channel]`` lane at once, carrying the order-32 state window.
Throughput comes from the batch axis, exactly as SURVEY.md §7 prescribes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flacx.format import Channels


def reconstruct_predicted(residual: jnp.ndarray, taps: jnp.ndarray,
                          shift: jnp.ndarray, order: jnp.ndarray,
                          dtype=jnp.int64, unroll: int = 32) -> jnp.ndarray:
    """Rebuild samples from residuals for fixed/LPC subframes.

    Args:
      residual: ``[..., n]`` int — warmup samples occupy positions
        ``i < order`` (verbatim-style), residuals the rest.
      taps: ``[..., T]`` int32 predictor taps (zero beyond order).
      shift: ``[...]`` int32.
      order: ``[...]`` int32.
      dtype: accumulator dtype.  int64 is always exact (§2.4 of
        SURVEY.md: up to ~bps+prec+log2(order) accumulator bits); the
        caller may select int32 when ``eff_bps + bitlen(Σ|taps|) + 1 <=
        31`` holds for the whole batch — typical for 16-bit streams with
        5-bit coefficients — which roughly halves VPU work on TPU where
        64-bit integers are emulated.
      unroll: scan unroll factor (per-step overhead amortization).
    Returns:
      ``[..., n]`` reconstructed samples in ``dtype``.
    """
    t = taps.shape[-1]
    n = residual.shape[-1]
    lead = residual.shape[:-1]
    # window carried TRANSPOSED ([t, ...lead]): with taps on the MINOR
    # axis the per-step arrays tile at ~t/128 lane utilization and the
    # sliding-window shift rewrites that padded layout every step —
    # measured as the bulk of the 1.6x mixed-vs-fixed decode gap
    # (COMPONENTS.md round-5 note); lanes-minor tiles are full
    taps_wt = jnp.moveaxis(taps[..., ::-1].astype(dtype), -1, 0)
    shift_w = shift.astype(dtype)
    # Feed residuals as scan inputs ([n, ...lead] layout) rather than
    # dynamic-slicing residual[..., i] each step: the per-step slice copy
    # costs as much as the IIR math itself on TPU (profiled ~3.8 ms of a
    # ~11 ms decode batch; the xs form measures 2.6 vs 4.5 ms/batch).
    res_t = jnp.moveaxis(residual.astype(dtype), -1, 0)

    # state: window of the last T samples, window[-1] = x[i-1]
    win0 = jnp.zeros((t, *lead), dtype)

    def step(win, xin):
        r, i = xin
        acc = jnp.sum(win * taps_wt, axis=0, dtype=dtype)
        pred = jnp.right_shift(acc, shift_w)
        x = r + jnp.where(i >= order, pred, 0)
        win = jnp.concatenate([win[1:], x[None]], axis=0)
        return win, x

    # Stay in the working dtype: the int32 fast path keeps every
    # downstream stage (wasted-bits shift, decorrelation, transpose)
    # out of emulated-64-bit VPU code; callers cast if they need i64.
    _, xs = jax.lax.scan(step, win0, (res_t, jnp.arange(n)), unroll=unroll)
    return jnp.moveaxis(xs, 0, -1)


def reconstruct_predicted_chunks(residual: jnp.ndarray, taps: jnp.ndarray,
                                 shift: jnp.ndarray, order: jnp.ndarray,
                                 state: jnp.ndarray, state_interval: int,
                                 dtype=jnp.int64,
                                 unroll: int = 32) -> jnp.ndarray:
    """Chunk-parallel IIR reconstruction from walker sample-state checkpoints.

    The C++ structure walker (flacx/native/hostops.cc::flacx_scan_frames
    with ``state_interval > 0``) runs the integer IIR inline during its
    serial residual walk and emits the last-32-samples window before every
    ``state_interval`` boundary.  Given those windows, every
    ``state_interval``-sample chunk of the batch reconstructs
    INDEPENDENTLY: the scan shrinks from ``n`` serial steps over ``F·C``
    lanes to ``SS`` steps over ``F·C·Ks`` lanes — an ``n/SS``-fold cut of
    the sample-serial critical path that :func:`reconstruct_predicted`
    walks (the LPC analogue of :func:`reconstruct_fixed_parallel`;
    replaces the reference's per-sample loop, flac/decoder.py:493-498).

    Args:
      residual: ``[F, C, n]`` int — warmup samples in positions
        ``i < order``, residuals elsewhere (same contract as
        :func:`reconstruct_predicted`).
      taps: ``[F, C, T]`` int32 predictor taps (zero beyond order).
      shift: ``[F, C]`` int32; order: ``[F, C]`` int32.
      state: ``[F, C, Ks, 32]`` int32 — ``state[..., m, i]`` is sample
        ``x[m·SS - 32 + i]`` (zero for negative indices).
      state_interval: SS (static); need not divide ``n``.
    Returns:
      ``[F, C, n]`` reconstructed samples in ``dtype``.
    """
    f, c, n = residual.shape
    t = taps.shape[-1]
    ss = state_interval
    ks = state.shape[-2]
    n_pad = ks * ss
    taps_wt = jnp.broadcast_to(taps[..., None, ::-1].astype(dtype),
                               (f, c, ks, t)).reshape(f * c * ks, t).T
    shift_w = jnp.broadcast_to(shift[..., None].astype(dtype),
                               (f, c, ks)).reshape(-1)
    order_w = jnp.broadcast_to(order[..., None], (f, c, ks)).reshape(-1)
    # absolute sample index of each chunk's first step (for the warmup
    # guard; only chunk 0 can contain warmup positions when SS >= 32)
    base = jnp.broadcast_to(jnp.arange(ks, dtype=jnp.int32) * ss,
                            (f, c, ks)).reshape(-1)

    res = residual.astype(dtype)
    if n_pad > n:
        res = jnp.pad(res, ((0, 0), (0, 0), (0, n_pad - n)))
    # [SS, F·C·Ks] step-major layout, matching the packer/unpacker trick:
    # every scan step reads one perfectly tiled vector
    res_t = jnp.moveaxis(res.reshape(f, c, ks, ss), -1, 0).reshape(ss, -1)

    # transposed window carry (lanes-minor) — see reconstruct_predicted
    win0 = state[..., 32 - t:].astype(dtype).reshape(f * c * ks, t).T

    def step(win, xin):
        r, i = xin
        acc = jnp.sum(win * taps_wt, axis=0, dtype=dtype)
        pred = jnp.right_shift(acc, shift_w)
        x = r + jnp.where(base + i >= order_w, pred, 0)
        win = jnp.concatenate([win[1:], x[None]], axis=0)
        return win, x

    _, xs = jax.lax.scan(step, win0, (res_t, jnp.arange(ss)), unroll=unroll)
    out = jnp.moveaxis(xs.reshape(ss, f, c, ks), 0, -1).reshape(f, c, n_pad)
    return out[..., :n]


def reconstruct_fixed_parallel(residual: jnp.ndarray, order: jnp.ndarray,
                               max_order: int,
                               dtype=jnp.int32) -> jnp.ndarray:
    """Fully parallel reconstruction for constant/verbatim/FIXED subframes.

    A fixed order-k predictor is the k-th finite difference
    (flac/common.py:15-21 taps are the binomial rows, shift always 0), so
    its inverse is k nested integrations — ``cumsum``s, not a sample-serial
    scan.  Two phases over ``a`` (= residual array with warmup samples in
    positions ``i < order``):

      1. difference triangle on the warmup prefix: after pass j, position
         ``i ∈ [j, order)`` holds Δʲ x[i]; on completion position i holds
         Δⁱ x[i] — the integration constant for level i.
      2. suffix integrations j = max_order-1 … 0: positions ``i ≥ j`` are
         replaced by their running sum (prefix masked out of the sum),
         applied only to lanes with ``order > j``.

    Every partial sum equals a j-th difference of true samples, bounded by
    ``2^(eff_bps + j + 1)`` — so the int32 fast path is exact whenever the
    scan path's ``use_i32`` criterion holds (Σ|taps| ≤ 15 for fixed).

    Args:
      residual: ``[..., n]`` int — warmup in positions ``i < order``.
      order: ``[...]`` int32, 0..4 (0 for constant/verbatim lanes).
      max_order: static upper bound on ``order`` (pass count).
    Returns:
      ``[..., n]`` reconstructed samples in ``dtype``.
    """
    n = residual.shape[-1]
    a = residual.astype(dtype)
    i = jnp.arange(n, dtype=jnp.int32)
    ord_ = order[..., None].astype(jnp.int32)

    for j in range(1, max_order):          # difference triangle (phase 1)
        d = a - jnp.roll(a, 1, axis=-1)
        a = jnp.where((i >= j) & (i < ord_), d, a)
    for j in range(max_order - 1, -1, -1):  # suffix integrations (phase 2)
        cs = jnp.cumsum(jnp.where(i >= j, a, 0), axis=-1, dtype=dtype)
        a = jnp.where((i >= j) & (ord_ > j), cs, a)
    return a


def undo_decorrelation(ch0: jnp.ndarray, ch1: jnp.ndarray,
                       mode: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert stereo decorrelation per frame.

    Args:
      ch0/ch1: ``[B, n]`` int64 decoded subframe samples.
      mode: ``[B]`` int32 channel codes (Channels values).
    Returns:
      ``(left, right)`` int64.
    """
    m = mode[..., None]
    l_s = m == int(Channels.L_S)
    s_r = m == int(Channels.S_R)
    m_s = m == int(Channels.M_S)

    left = jnp.where(l_s, ch0,
                     jnp.where(s_r, ch0 + ch1, ch0))
    right = jnp.where(l_s, ch0 - ch1,
                      jnp.where(s_r, ch1, ch1))
    ms_right = ch0 - (ch1 >> 1)
    left = jnp.where(m_s, ms_right + ch1, left)
    right = jnp.where(m_s, ms_right, right)
    return left, right
