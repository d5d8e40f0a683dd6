"""Batched TPU-native FLAC encoder.

The reference processes one sample at a time through five Python layers
(SURVEY.md §3.1); here a whole batch of ``[B, channels, block_size]`` PCM
blocks flows through ONE jitted pipeline:

  stereo candidates → fixed/LPC analysis (all orders at once) → candidate
  ranking → exact integer residuals → exhaustive Rice search → symbol
  emission → prefix-sum bit packing → CRC folding

yielding complete, CRC'd FLAC frames as byte rows.  The host only feeds PCM
batches, concatenates the variable-length rows, and encodes the (single)
short final block via the oracle.

Improvements over the reference encoder, all spec-conformant:
* per-frame stereo decorrelation (L/S, S/R, M/S) — the reference never uses
  it (README.md:128),
* constant/verbatim subframes with exact-size selection (reference
  considers only fixed/LPC and compares by residual magnitude,
  flac/encoder.py:104-157),
* exact exhaustive Rice parameter search (reference uses a mean estimate,
  flac/encoder.py:730-753).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
import numpy as np

import flacx.ops  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

from flacx.format import (FIXED_PREDICTOR_TAPS, INDEPENDENT_CHANNELS,
                          Channels)
from flacx.ops import emit, rice
from flacx.ops.bitpack import pack_symbols_words, words_to_bytes
from flacx.ops.crcfold import crc16_over_word_rows
from flacx.ops.fixedpred import fixed_order_zz_sums
from flacx.ops.headers import frame_header_symbols
from flacx.ops.lpc import (apodization_window_np, autocorrelate,
                           levinson_all_orders, lpc_residuals_all,
                           predict_residual, predict_residual_fused,
                           quantize_all_orders)

_INF = jnp.int64(1) << 50

#: stereo modes: (channel code, virtual-channel pair, decorrelation bits)
_STEREO_MODES = (
    (Channels.L_R, (0, 1), (0, 0)),
    (Channels.L_S, (0, 3), (0, 1)),
    (Channels.S_R, (3, 1), (1, 0)),
    (Channels.M_S, (2, 3), (0, 1)),
)


def _select_case(idx: jnp.ndarray, arr: jnp.ndarray,
                 axis: int) -> jnp.ndarray:
    """``arr`` indexed by ``idx`` along a SMALL static ``axis``.

    ``take_along_axis`` lowers to a general gather, which TPUs execute at
    ~10 ns/index; when the indexed axis is tiny (candidate orders, stereo
    pairs) a ``select_n`` over statically-sliced cases fuses into one
    elementwise pass instead (profiled 0.63 → ~0.05 ms/batch at 1024
    frames).  ``idx`` must broadcast against ``arr`` without ``axis``.
    """
    cases = [jax.lax.index_in_dim(arr, k, axis, keepdims=False)
             for k in range(arr.shape[axis])]
    which = jnp.broadcast_to(
        idx.reshape(idx.shape + (1,) * (cases[0].ndim - idx.ndim)),
        cases[0].shape)
    return jax.lax.select_n(which, *cases)


def device_min_block_size(max_lpc_order: int) -> int:
    """Smallest block size the batched device pipeline accepts.

    Blocks below this (the reference encodes any size, forcing fixed
    order 0 for blocks ≤ 4, flac/encoder.py:334-338) route through the
    oracle encoder instead — see ``flacx.pipeline``.
    """
    return 2 * max(max_lpc_order, 4) + 2


@dataclass(frozen=True)
class EncoderConfig:
    """Static (compile-time) encoder configuration."""
    sample_rate: int = 44100
    bps: int = 16
    channels: int = 2
    block_size: int = 4608
    max_lpc_order: int = 12
    qlp_precision: int = 5
    partition_orders: tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    stereo: str = "auto"          # "auto" | "independent"
    #: "estimate" ranks LPC orders by the Levinson prediction error (the
    #: shortcut libFLAC's fast presets use) and computes exact residuals
    #: only for the winner; "exact" evaluates every order's true integer
    #: residual (best compression, ~reference-like selection).
    order_search: str = "estimate"
    #: LPC analysis float width: "f32" halves analysis HBM traffic (the
    #: speed default — quantized-coefficient choices differ only slightly
    #: from f64 and never affect correctness), "f64" matches the
    #: reference's CPython float analysis (flac/encoder.py:367-381);
    #: "auto" = f32 for the estimate-mode order search, f64 for exact
    #: (where best compression is the point).
    analysis_dtype: str = "auto"
    #: Emit ESCAPED Rice partitions (raw two's-complement blocks) where
    #: strictly smaller than every eligible Rice parameter — typically
    #: partitions of near-uniform huge residuals that the 32-bit symbol
    #: cap (flacx.ops.rice.CODE_BITS_MAX) would otherwise force into an
    #: expensive high-k code or a whole-subframe verbatim.  The reference
    #: decoder reads escapes (flac/decoder.py:387-411); its encoder
    #: cannot write them (flac/encoder.py:770-772).
    escapes: bool = True
    #: Detect and strip shared trailing zero bits per subframe (the
    #: reference encoder never sets wasted bits, flac/encoder.py:556).
    #: Spec-correct (RFC 9639) and handled by flacx's own and libFLAC's
    #: decoders, but DEFAULT OFF because the reference *decoder* misparses
    #: the wasted-bits unary (off-by-one, flac/decoder.py:346-355 — it
    #: crashes on such streams) and out-of-the-box interop with it is a
    #: compatibility goal.
    wasted_bits: bool = False
    #: LPC apodization window candidates (libFLAC-style ``-A`` names,
    #: see :func:`flacx.ops.lpc.apodization_window_np`).  The reference
    #: hardcodes Tukey(0.5) (flac/encoder.py:423-440); with several
    #: windows flacx analyses each and keeps, per (frame, channel,
    #: order), the window whose quantized predictor yields the smallest
    #: predicted residual — a standard compression lever beyond parity.
    windows: tuple[str, ...] = ("tukey(0.5)",)
    #: Reference-conformance mode: reproduce the reference encoder's
    #: parameter choices exactly (magnitude-heuristic selection,
    #: CPython-sequenced f64 analysis, mean-estimate Rice parameters,
    #: independent channels) so the device frames are byte-identical to
    #: the oracle's — see ``flacx.conformance``.  Forces
    #: stereo="independent", escapes off, wasted bits off.
    conformance: bool = False

    def __post_init__(self):
        if self.conformance:
            object.__setattr__(self, "stereo", "independent")
            object.__setattr__(self, "escapes", False)
            object.__setattr__(self, "wasted_bits", False)
            object.__setattr__(self, "windows", ("tukey(0.5)",))
        if isinstance(self.windows, str):          # accept a lone name
            object.__setattr__(self, "windows", (self.windows,))
        if not self.windows:
            raise ValueError("windows must name at least one window")
        from flacx.ops.lpc import apodization_window_np
        for w in self.windows:
            apodization_window_np(w, 64)           # validate eagerly
        if self.order_search not in ("estimate", "exact"):
            raise ValueError("order_search must be 'estimate' or 'exact'")
        if self.analysis_dtype not in ("auto", "f32", "f64"):
            raise ValueError("analysis_dtype must be 'auto', 'f32' or 'f64'")
        if not 1 <= self.channels <= 8:
            raise ValueError("channels must be in 1..8")
        if not 0 <= self.max_lpc_order <= 32:
            raise ValueError("max LPC order is 32")
        if self.max_lpc_order and self.qlp_precision < 5:
            raise ValueError("qlp precision must be >= 5")
        if self.block_size < device_min_block_size(self.max_lpc_order):
            raise ValueError("block size too small for requested LPC order"
                             " (route through the oracle path instead, see"
                             " flacx.pipeline)")
        if self.bps > 31 and self.stereo == "auto":
            # side channel would need 33-bit samples; stay independent
            object.__setattr__(self, "stereo", "independent")

    # -- derived static values ---------------------------------------------

    @property
    def use_stereo_modes(self) -> bool:
        return self.channels == 2 and self.stereo == "auto"

    @property
    def max_taps(self) -> int:
        return max(self.max_lpc_order, 4)

    @property
    def kmax(self) -> int:
        return min(30, self.bps + 7)

    @property
    def porders(self) -> tuple[int, ...]:
        """Legal partition orders: requested ∪ {0} fallback, filtered only
        by the 4-bit field (≤ 15) and divisibility — exactly the
        reference's filter (flac/encoder.py:655-695, filter at 664-667).
        Every requested order is searched; sub-64-sample partitions (down
        to 1 sample at block 16384 / -r 14) take the k-chunked plan path
        in ``flacx.ops.rice`` to bound search memory."""
        legal = [o for o in self.partition_orders
                 if o <= 15 and self.block_size % (1 << o) == 0]
        return tuple(sorted(set(legal) | {0}))

    @property
    def preferred_porders(self) -> tuple[int, ...]:
        return tuple(o for o in self.porders if o in self.partition_orders)

    @property
    def eff_bps(self) -> int:
        """Max per-virtual-channel sample width (side channel is bps+1)."""
        return self.bps + (1 if self.use_stereo_modes else 0)

    @property
    def lpc_acc_dtype(self):
        """LPC MAC accumulator dtype (int64 is u32-pair emulated on TPU —
        ~4× the VPU work — so use int32 whenever the static bound
        ``eff_bps + 1 + ceil(log2(P · 2^(prec-1)))`` fits 31 bits;
        bit-identical where it applies)."""
        import jax.numpy as _jnp
        sum_taps = max(1, self.max_lpc_order << max(self.qlp_precision - 1,
                                                    0))
        return (_jnp.int32
                if self.eff_bps + 1 + sum_taps.bit_length() <= 31
                else _jnp.int64)

    @property
    def fixed_acc_dtype(self):
        """Fixed-predictor MAC accumulator (Σ|taps| ≤ 15 at order 4)."""
        import jax.numpy as _jnp
        return _jnp.int32 if self.eff_bps + 1 + 4 <= 31 else _jnp.int64

    @property
    def work_dtype(self):
        """Residual/zigzag working dtype.

        int32 halves HBM traffic and is exact whenever every zigzag
        magnitude fits 31 bits: fixed residuals are bounded by
        2^(bps+1+4) and LPC residuals are overflow-checked at selection
        time (pathological subframes fall back to verbatim).
        """
        import jax.numpy as _jnp
        return _jnp.int32 if self.bps <= 24 else _jnp.int64

    @property
    def max_frame_bytes(self) -> int:
        side = 1 if self.use_stereo_modes else 0
        bits = (16 * 8 + self.channels * (8 + self.block_size *
                                          (self.bps + side)) + 64)
        # 256-aligned so frames pack into whole compaction chunks
        return ((bits // 8 + 2) + 255) // 256 * 256


# ---------------------------------------------------------------------------
# The jitted pipeline


def _encode_batch(cfg: EncoderConfig, pcm: jnp.ndarray,
                  frame_index: jnp.ndarray,
                  _stop_after: str | None = None) -> dict:
    """pcm int32 ``[B, channels, N]`` → packed frames ``[B, max_bytes]``.

    ``frame_index`` is either a scalar (first index of a contiguous batch)
    or a per-frame ``[B]`` array (corpus mode mixes frames of many files
    in one dispatch).  ``_stop_after`` truncates the pipeline for
    stage-level profiling.
    """
    n = cfg.block_size
    b_in = pcm.shape[0]
    if (jax.default_backend() == "tpu" and b_in % 128 != 0
            and _stop_after is None):
        # pad ragged batches to the 128-lane tile quantum so odd final
        # batches (and small batch_frames) keep the kernel-resident
        # fast paths; pad frames are all-zero (constant subframes) and
        # their outputs are sliced off below
        pcm = jnp.concatenate(
            [pcm, jnp.zeros(((-b_in) % 128, *pcm.shape[1:]), pcm.dtype)],
            axis=0)
    b = pcm.shape[0]
    p = cfg.max_lpc_order
    t = cfg.max_taps
    prec = cfg.qlp_precision

    # ----- virtual channels -----------------------------------------------
    if cfg.use_stereo_modes:
        left = pcm[:, 0].astype(jnp.int32)
        right = pcm[:, 1].astype(jnp.int32)
        mid = (left + right) >> 1
        side = left - right
        x_v = jnp.stack([left, right, mid, side], axis=1)       # [B, 4, N]
        bps_v = jnp.array([cfg.bps, cfg.bps, cfg.bps, cfg.bps + 1],
                          jnp.int32)
    else:
        x_v = pcm.astype(jnp.int32)
        bps_v = jnp.full((cfg.channels,), cfg.bps, jnp.int32)
    nv = x_v.shape[1]

    # ----- wasted bits: strip shared trailing zeros per virtual channel ----
    if cfg.wasted_bits:
        xu = x_v.astype(jnp.uint32)
        lowbit = xu & (~xu + jnp.uint32(1))
        tz = jnp.where(lowbit == 0, 63,
                       jnp.round(jnp.log2(jnp.maximum(
                           lowbit.astype(jnp.float64), 1.0))).astype(
                               jnp.int32))
        w_v = jnp.clip(jnp.min(tz, axis=-1), 0,
                       bps_v[None, :] - 1).astype(jnp.int32)   # [B,V]
        x_v = x_v >> w_v[..., None]
        bps_v = bps_v[None, :] - w_v                           # [B,V] dynamic
    else:
        w_v = jnp.zeros((b, nv), jnp.int32)
        bps_v = jnp.broadcast_to(bps_v, (b, nv))

    # ----- candidate analysis (fixed orders 0..4, LPC orders 1..P) --------
    cand_orders = jnp.array(list(range(5)) + list(range(1, p + 1)),
                            jnp.int32)                           # [5+P]
    i_pos = jnp.arange(n, dtype=jnp.int32)
    wdt = cfg.work_dtype

    # kernel-resident fast-path gates, decided up front (all static):
    # the blocked emit layout + the fused residual→zigzag kernel.  When
    # use_fused_zz holds, the selected residual NEVER materializes in
    # HBM — the per-virtual-channel stats pass skips its residual write
    # and the post-selection zigzag is one VMEM-resident kernel.
    c_static = 2 if cfg.use_stereo_modes else cfg.channels
    psize_min = n >> max(cfg.porders)
    layout_ok = (emit.blocked_layout_ok(n, psize_min)
                 or emit.segmented_layout(n, psize_min) is not None)
    use_tile_emit = (jax.default_backend() == "tpu" and wdt == jnp.int32
                     and layout_ok
                     and b % 128 == 0 and c_static <= 8
                     and cfg.eff_bps <= 31 and _stop_after is None)
    if (jax.default_backend() == "tpu" and not use_tile_emit
            and _stop_after is None):
        # no-silent-caps: say WHY the kernel-resident emit/pack path is
        # off (once per distinct reason set — jit traces once per config)
        import logging
        reasons = [r for ok, r in [
            (wdt == jnp.int32, f"work dtype {jnp.dtype(wdt).name}"),
            (layout_ok, f"slot layout untileable (n={n}, "
                        f"psize_min={psize_min})"),
            (b % 128 == 0, f"batch {b} not a multiple of 128"),
            (c_static <= 8, f"{c_static} channels > 8"),
            (cfg.eff_bps <= 31, f"eff_bps {cfg.eff_bps} > 31"),
        ] if not ok]
        logging.getLogger("flacx").info(
            "tile emit/pack fast path disabled (%s); using the XLA "
            "symbol path", "; ".join(reasons))
    # kernel-resident exact Rice search (flacx.kernels.rice_tile): one
    # pass over zz instead of one XLA re-stream per candidate k — the
    # single largest HBM-traffic item of the r4 pipeline (~0.95 GB of
    # 7.7 GB reported per headline batch)
    from flacx.kernels.rice_tile import supported_levels
    use_rice_kernel = (jax.default_backend() == "tpu"
                       and wdt == jnp.int32 and b % 128 == 0
                       and _stop_after is None
                       and supported_levels(n, cfg.porders, 512)
                       is not None)

    def _mk_plan(zzarr, orderarr):
        stats = None
        if use_rice_kernel:
            from flacx.kernels.rice_tile import rice_stats_tiles
            stats = rice_stats_tiles(zzarr, orderarr.astype(jnp.int32),
                                     cfg.porders, cfg.kmax)
        return rice.exact_plan(zzarr, orderarr, cfg.porders,
                               cfg.preferred_porders, cfg.kmax,
                               allow_escape=cfg.escapes,
                               kernel_stats=stats)

    sum_taps_merged = max(max(1, p << max(prec - 1, 0)), 15)
    from flacx.kernels.lpcres_tile import split_mac_ok
    # the zigzag-residual kernel is exact under the single-int32 MAC
    # bound, or — for hi-res widths past it — under the two-limb split
    # MAC (chosen lanes provably non-overflowing); long blocks take its
    # chunked form, so n is unconstrained
    fused_zz_i32 = (cfg.eff_bps + 1 + sum_taps_merged.bit_length() <= 31)
    fused_zz_split = (not fused_zz_i32
                      and split_mac_ok(cfg.eff_bps, sum_taps_merged))
    # exact-order search: the all-orders stats kernel replaces the
    # [B, V, P, N] residual stack (reference recomputes one residual per
    # candidate order, flac/encoder.py:374-390; the stack was ~0.9 GB
    # per headline batch) with a single VMEM pass per window — gated on
    # the single-int32 exactness bounds, so results are bit-identical
    from flacx.kernels.lpcres_tile import allorder_stats_ok
    use_allorder = (jax.default_backend() == "tpu" and wdt == jnp.int32
                    and cfg.order_search == "exact" and p > 0
                    and b % 128 == 0 and _stop_after is None
                    and allorder_stats_ok(cfg.eff_bps, sum_taps_merged))
    use_fused_zz = ((fused_zz_i32 or fused_zz_split)
                    and (use_tile_emit if cfg.order_search == "estimate"
                         else use_allorder))

    adt = (jnp.float64 if cfg.analysis_dtype == "f64"
           or (cfg.analysis_dtype == "auto" and cfg.order_search == "exact")
           else jnp.float32)
    if p:
        # Per-window LPC analysis (windowing = elementwise mul; f32 by
        # default — halves analysis traffic; f64 under exact/auto for
        # reference-grade coefficient choices; the autocorr accumulation
        # and Levinson recursion are always f64).  With several windows
        # (cfg.windows, the libFLAC -A lever — the reference hardcodes
        # Tukey(0.5), flac/encoder.py:423-440) the candidates merge
        # ELEMENTWISE per (frame, channel, order) on the predicted
        # residual-magnitude ranking, so everything downstream sees one
        # best-of-windows candidate set and is window-agnostic.
        lcounts = (n - cand_orders[5:]).astype(jnp.int64)
        qcoefs = qshifts = lpc_valid = lzz_sum = lres = wrank = None
        lmax = None
        for wname in cfg.windows:
            wnp = apodization_window_np(wname, n)
            w32 = jnp.asarray(wnp.astype(adt))
            # f32 analysis hands the kernel the raw int32 signal — the
            # f32 conversion happens in VMEM (no [B,V,N] f32 HBM copy)
            autoc = autocorrelate(x_v if adt == jnp.float32
                                  else x_v.astype(adt), p, window=w32)
            taps_f, lpc_err, valid_ld = levinson_all_orders(autoc, p)
            # Levinson-Durbin returns the ANALYSIS polynomial a[1:]
            # (error filter e = Σ a_j·x[i-j]); the PREDICTION
            # coefficients for x̂[i] = Σ c_j·x[i-1-j] are their
            # negation.  The reference uses a[1:] unnegated
            # (flac/encoder.py:374-390,479), a sign defect that makes
            # its LPC residuals ~larger than the signal, so LPC
            # essentially never wins its fixed-vs-LPC comparison —
            # measured here: negation shrinks LPC-8 residual magnitudes
            # ~200× on tonal content and beats the best fixed order
            # ~9×.  The conformance mode (flacx/conformance.py) keeps
            # the reference's sign for byte-compat; this production
            # path predicts correctly.
            qcoefs_w, qshifts_w, valid_q = quantize_all_orders(-taps_f,
                                                               prec)
            lpc_valid_w = valid_ld & valid_q                    # [B,V,P]
            if cfg.order_search == "exact" and use_allorder:
                from flacx.kernels.lpcres_tile import lpc_allorder_stats
                lres_w = None
                lmax_w = None
                lzz_sum_w, lmax_w = lpc_allorder_stats(
                    x_v, qcoefs_w.astype(jnp.int32),
                    qshifts_w.astype(jnp.int32))
            elif cfg.order_search == "exact":
                lres_w = lpc_residuals_all(x_v, qcoefs_w, qshifts_w,
                                           cfg.lpc_acc_dtype)  # [B,V,P,N]
                lmax_w = None
                lmask = i_pos >= cand_orders[5:, None]
                lzz_sum_w = jnp.sum(rice.zigzag(lres_w) * lmask, axis=-1,
                                    dtype=jnp.int64)
            else:
                lres_w = None
                lmax_w = None
                # the error power is in the windowed domain; undo the
                # window's average power so fixed (unwindowed) and LPC
                # estimates compare, and so different windows compare
                win_pow = float(np.mean(wnp ** 2))
                sigma = jnp.sqrt(jnp.maximum(lpc_err, 0.0) / (n * win_pow))
                mean_abs = jnp.sqrt(2.0 / jnp.pi) * sigma
                lzz_sum_w = (2.0 * mean_abs * lcounts).astype(jnp.int64)
            # ranking basis: predicted zigzag magnitude sum (estimate_bits
            # is monotone in it at fixed count), invalid candidates last
            wrank_w = jnp.where(lpc_valid_w, lzz_sum_w, _INF)
            if qcoefs is None:
                qcoefs, qshifts, lpc_valid = qcoefs_w, qshifts_w, lpc_valid_w
                lzz_sum, lres, wrank = lzz_sum_w, lres_w, wrank_w
                lmax = lmax_w
            else:
                bet = wrank_w < wrank
                wrank = jnp.where(bet, wrank_w, wrank)
                lzz_sum = jnp.where(bet, lzz_sum_w, lzz_sum)
                lpc_valid = bet & lpc_valid_w | ~bet & lpc_valid
                qshifts = jnp.where(bet, qshifts_w, qshifts)
                qcoefs = jnp.where(bet[..., None], qcoefs_w, qcoefs)
                if lres is not None:
                    lres = jnp.where(bet[..., None], lres_w, lres)
                if lmax is not None:
                    lmax = jnp.where(bet, lmax_w, lmax)
    else:
        qcoefs = jnp.zeros((b, nv, 1, 1), jnp.int32)
        qshifts = jnp.zeros((b, nv, 1), jnp.int32)

    bps_v64 = bps_v.astype(jnp.int64)                            # [B,V]
    over_warm = cand_orders.astype(jnp.int64) * bps_v64[..., None]

    # candidate size estimates: fixed orders from exact magnitude sums
    # (incremental diff chain — never materializes the [B,V,5,N] stack),
    # LPC orders either exact sums (order_search="exact") or mapped from
    # the Levinson error power via E|r| ≈ sqrt(2/π)·σ ("estimate")
    fzz_sum = fixed_order_zz_sums(x_v.astype(wdt),
                                  cfg.eff_bps)                   # [B,V,5]
    fcounts = (n - cand_orders[:5]).astype(jnp.int64)
    fest = (rice.estimate_bits(fzz_sum, fcounts, cfg.kmax)
            + 8 + over_warm[..., :5])

    if p:
        # lzz_sum is the merged best-of-windows predicted magnitude sum
        # per (frame, channel, order) — exact sums in "exact" mode,
        # Levinson-error-mapped in "estimate" mode (computed per window
        # in the analysis loop above)
        lest = rice.estimate_bits(lzz_sum, lcounts, cfg.kmax)
        lest = (lest + 8 + over_warm[..., 5:]
                + 9 + cand_orders[5:].astype(jnp.int64) * prec)
        lest = jnp.where(lpc_valid, lest, _INF)
        est = jnp.concatenate([fest, lest], axis=-1)
    else:
        est = fest

    if _stop_after == "analysis":
        return {"est": est}
    fixed_bits = jnp.min(est[..., :5], axis=-1)
    fixed_order = jnp.argmin(est[..., :5], axis=-1).astype(jnp.int32)
    if p:
        lpc_order = (jnp.argmin(est[..., 5:], axis=-1) + 1).astype(jnp.int32)
        lo0 = (lpc_order - 1).astype(jnp.int32)
        taps_lpc_v = _select_case(lo0, qcoefs, axis=2)
        shift_lpc_v = _select_case(lo0, qshifts, axis=2)
        # cross-family comparison always on EXACT magnitude sums (the
        # Levinson error is optimistic about post-quantization residuals)
        if cfg.order_search == "exact" and use_allorder:
            # stats-only kernel path: the per-order sums/maxima already
            # exist — select the chosen order's, no residual gather
            lpc_res = None
            lzz_exact = _select_case(lo0, lzz_sum, axis=2)
            lpc_maxabs = _select_case(lo0, lmax, axis=2)
        elif cfg.order_search == "exact":
            lpc_res = _select_case(lo0, lres, axis=2)
            lmask_best = i_pos >= lpc_order[..., None]
            lpc_res = lpc_res * lmask_best    # zero the warmup junk
            lzz_exact = jnp.sum(rice.zigzag(lpc_res), axis=-1,
                                dtype=jnp.int64)
            lpc_maxabs = jnp.minimum(jnp.max(jnp.abs(lpc_res), axis=-1),
                                     (1 << 31) - 1).astype(jnp.int32)
        else:
            sum_taps_max = max(1, p << max(prec - 1, 0))
            lpc_res, lzz_exact, lpc_maxabs = predict_residual_fused(
                x_v, taps_lpc_v, shift_lpc_v, lpc_order,
                cfg.eff_bps, sum_taps_max, stats_only=use_fused_zz)
        lpc_bits = (rice.estimate_bits(
            lzz_exact, (n - lpc_order).astype(jnp.int64), cfg.kmax)
            + 8 + lpc_order.astype(jnp.int64) * bps_v64
            + 9 + lpc_order.astype(jnp.int64) * prec)
        lpc_ok = _select_case(lo0, lpc_valid, axis=lpc_valid.ndim - 1)
        if wdt == jnp.int32:
            # residuals that cannot survive the int32 working dtype make
            # the LPC candidate ineligible (verbatim/fixed win instead)
            lpc_ok = lpc_ok & (lpc_maxabs < (1 << 30))
        lpc_bits = jnp.where(lpc_ok, lpc_bits, _INF)
        if lpc_res is not None:          # fused-zz path is stats-only
            lpc_res = lpc_res.astype(wdt)
        pred_is_lpc = lpc_bits < fixed_bits
    else:
        lpc_bits = jnp.full_like(fixed_bits, _INF)
        lpc_order = jnp.ones_like(fixed_order)
        lpc_res = jnp.zeros((b, nv, n), wdt)
        taps_lpc_v = jnp.zeros((b, nv, 1), jnp.int32)
        shift_lpc_v = jnp.zeros((b, nv), jnp.int32)
        pred_is_lpc = jnp.zeros_like(fixed_bits, bool)
    pred_bits = jnp.minimum(fixed_bits, lpc_bits)
    pred_order = jnp.where(pred_is_lpc, lpc_order, fixed_order)

    const_ok = jnp.all(x_v == x_v[..., :1], axis=-1)             # [B,V]
    bps_bv = bps_v.astype(jnp.int64)                             # [B,V]
    const_bits = jnp.where(const_ok, 8 + bps_bv, _INF)
    verb_bits = 8 + n * bps_bv

    # Exact mode ranks the stereo modes by the TRUE exact Rice plan of
    # every virtual channel (the estimate can misrank modes by a few
    # dozen bytes per frame — measured on tonal+noise content); the plan
    # of the winning channels is then reused for emission.  Estimate mode
    # keeps the cheap ranking and plans only the selected channels.
    plan_v = None
    if cfg.use_stereo_modes and cfg.order_search == "exact":
        taps_fix4_v = jnp.asarray(FIXED_PREDICTOR_TAPS)[fixed_order]
        if lpc_res is None:
            # kernel path: merge per-virtual-channel chosen taps and let
            # the fused MAC+zigzag kernel recompute the residual in VMEM
            # (bit-identical to the where-merge it replaces)
            from flacx.kernels.lpcres_tile import zigzag_residual_tiles
            tfix = jnp.pad(taps_fix4_v, ((0, 0), (0, 0), (0, t - 4)))
            tlpc = taps_lpc_v
            if t > p:
                tlpc = jnp.pad(tlpc, ((0, 0), (0, 0), (0, t - p)))
            taps_v_all = jnp.where(pred_is_lpc[..., None], tlpc, tfix)
            shift_v_all = jnp.where(pred_is_lpc, shift_lpc_v, 0) \
                .astype(jnp.int32)
            zz_v = zigzag_residual_tiles(x_v, taps_v_all.astype(jnp.int32),
                                         shift_v_all, pred_order,
                                         split=fused_zz_split)
        else:
            res_fix_v = predict_residual(
                x_v, taps_fix4_v, jnp.zeros((b, nv), jnp.int32),
                cfg.fixed_acc_dtype).astype(wdt)
            res_v = jnp.where(pred_is_lpc[..., None], lpc_res, res_fix_v)
            zz_v = rice.zigzag(res_v) * (i_pos >= pred_order[..., None])
        plan_v = _mk_plan(zz_v, pred_order)
        pred_bits = (8 + pred_order.astype(jnp.int64) * bps_bv
                     + jnp.where(pred_is_lpc,
                                 9 + pred_order.astype(jnp.int64) * prec, 0)
                     + plan_v.bits)
    cost_v = jnp.minimum(jnp.minimum(pred_bits, verb_bits), const_bits)

    # ----- stereo mode / channel selection --------------------------------
    if cfg.use_stereo_modes:
        pairs = jnp.array([m[1] for m in _STEREO_MODES], jnp.int32)  # [4,2]
        codes = jnp.array([int(m[0]) for m in _STEREO_MODES], jnp.int32)
        decorr = jnp.array([m[2] for m in _STEREO_MODES], jnp.int32)  # [4,2]
        mode_cost = (jnp.take(cost_v, pairs[:, 0], axis=1)
                     + jnp.take(cost_v, pairs[:, 1], axis=1))     # [B,4]
        mode = jnp.argmin(mode_cost, axis=-1).astype(jnp.int32)   # [B]
        ch_code = codes[mode]
        sel = pairs[mode]                                         # [B,2]
        c = 2

        def gather_v(arr):
            # pick each frame's winning channel pair.  A select_n over
            # the 4 static pair stacks measured WORSE here than the
            # gather for the [B,2,N] arrays (XLA picks a degenerate
            # T(2,128) tiling for the fused select), so the wide arrays
            # keep take_along_axis; only tiny per-lane selections use
            # _select_case.
            idx = sel.reshape(b, c, *([1] * (arr.ndim - 2)))
            return jnp.take_along_axis(arr, idx.astype(jnp.int32), axis=1)

        bps_c = gather_v(bps_v)                                   # [B,2]
    else:
        c = cfg.channels
        ch_code = jnp.full((b,), int(INDEPENDENT_CHANNELS[c]), jnp.int32)
        bps_c = bps_v

        def gather_v(arr):
            return arr

    x_sel = gather_v(x_v)
    is_lpc = gather_v(pred_is_lpc)
    order = gather_v(pred_order)
    const_sel = gather_v(const_ok)
    f_order = gather_v(fixed_order)
    wasted = gather_v(w_v)                                       # [B,C]

    # chosen taps & residual: the selected fixed residual is recomputed on
    # the narrow [B, C] domain (cheaper than materializing + gathering the
    # [B, V, 5, N] stack); the LPC residual is gathered from the single
    # per-channel best already computed above.  (Exact mode already has
    # every virtual channel's residual and plan — gather those instead;
    # the fused-zz path recomputes the whole residual in VMEM below.)
    taps_fix4 = jnp.asarray(FIXED_PREDICTOR_TAPS)[f_order]       # [B,C,4]
    if plan_v is None and not use_fused_zz:
        res_fix = predict_residual(
            x_sel, taps_fix4, jnp.zeros((b, c), jnp.int32),
            cfg.fixed_acc_dtype).astype(wdt)
        res = jnp.where(is_lpc[..., None], gather_v(lpc_res), res_fix)

    taps_fix = jnp.pad(taps_fix4, ((0, 0), (0, 0), (0, t - 4)))
    if p:
        taps_lpc = gather_v(taps_lpc_v)                          # [B,C,P]
        if t > p:
            taps_lpc = jnp.pad(taps_lpc, ((0, 0), (0, 0), (0, t - p)))
        shift_lpc = gather_v(shift_lpc_v)
        taps = jnp.where(is_lpc[..., None], taps_lpc, taps_fix)
        shift = jnp.where(is_lpc, shift_lpc, 0).astype(jnp.int32)
    else:
        taps = taps_fix
        shift = jnp.zeros((b, c), jnp.int32)

    # ----- exhaustive Rice plan on the chosen exact residual ---------------
    if _stop_after == "select":
        return {"taps": taps, "shift": shift, "order": order}
    if plan_v is not None:
        zz = gather_v(zz_v)
        plan = rice.RicePlan(*(gather_v(f) for f in plan_v))
    elif use_fused_zz:
        # one VMEM-resident MAC+zigzag from the merged per-channel taps —
        # bit-identical to the res_fix/merge/zigzag chain it replaces
        from flacx.kernels.lpcres_tile import zigzag_residual_tiles
        zz = zigzag_residual_tiles(x_sel, taps.astype(jnp.int32),
                                   shift, order, split=fused_zz_split)
    else:
        in_resid = i_pos >= order[..., None]
        zz = rice.zigzag(res) * in_resid
    if _stop_after == "residual":
        return {"zz": zz}
    if plan_v is None:
        plan = _mk_plan(zz, order)
    if _stop_after == "plan":
        return {"bits": plan.bits, "k": plan.k_sample}

    # ----- final kind by exact size ---------------------------------------
    bps_c64 = bps_c.astype(jnp.int64)
    pred_total = (8 + order.astype(jnp.int64) * bps_c64
                  + jnp.where(is_lpc, 9 + order.astype(jnp.int64) * prec, 0)
                  + plan.bits)
    verb_total = 8 + n * bps_c64
    kind = jnp.where(
        const_sel, emit.KIND_CONSTANT,
        jnp.where(verb_total < pred_total, emit.KIND_VERBATIM,
                  jnp.where(is_lpc, emit.KIND_LPC, emit.KIND_FIXED)))
    sub_bits = jnp.where(const_sel, 8 + bps_c64,
                         jnp.minimum(verb_total, pred_total))

    # ----- emission --------------------------------------------------------
    indices = (frame_index + jnp.arange(b, dtype=jnp.int64)
               if frame_index.ndim == 0 else frame_index.astype(jnp.int64))
    hdr = frame_header_symbols(indices, ch_code, n)

    if use_tile_emit:
        # kernel-resident emit→pack (flacx.ops.tilepack): per-sample
        # symbols never materialize in HBM, no transposes around the
        # merges; nbytes rounds up — strings are zero-filled, so the
        # final partial byte equals the classic path's pad symbol.
        # The merge kernel byteswaps in VMEM and the CRC-16 folds on
        # the pre-transpose words (flacx.kernels.crc_tile), so the byte
        # split below is a free bitcast and no XLA pass re-reads words.
        from flacx.ops.tilepack import pack_frames_tiled
        frame_words_le, total_bits, crc = pack_frames_tiled(
            hdr.values, hdr.lengths, kind, order, bps_c, x_sel, taps,
            shift, prec, zz, plan, wasted, psize_min,
            cfg.max_frame_bytes)
        nbytes = (total_bits + 7) // 8
        frame_bytes = jax.lax.bitcast_convert_type(
            frame_words_le, jnp.uint8).reshape(b, -1)
    else:
        sv, sl = emit.subframe_symbols(kind, order, bps_c, x_sel, taps,
                                       shift, prec, zz, plan,
                                       psize_min=psize_min, wasted=wasted)
        sv = sv.reshape(b, -1)
        sl = sl.reshape(b, -1)

        body_bits = (jnp.sum(hdr.lengths, axis=-1)
                     + jnp.sum(sl, axis=-1, dtype=jnp.int64)
                     ).astype(jnp.int32)
        pad = (-body_bits) % 8
        values = jnp.concatenate(
            [hdr.values, sv, jnp.zeros((b, 1), jnp.uint32)], axis=-1)
        lengths = jnp.concatenate([hdr.lengths, sl, pad[:, None]], axis=-1)

        if _stop_after == "emit":
            return {"sv": values, "sl": lengths}
        frame_words, total_bits = pack_symbols_words(values, lengths,
                                                     cfg.max_frame_bytes)
        if _stop_after == "pack":
            return {"words": frame_words, "bits": total_bits}
        nbytes = total_bits // 8
        # CRC folds straight from the packed words (a quarter the stream
        # of the byte expansion); the byte split is a byteswap+bitcast
        crc = crc16_over_word_rows(frame_words, nbytes)
        frame_bytes = words_to_bytes(frame_words)
    pos = jnp.arange(cfg.max_frame_bytes, dtype=jnp.int32)
    frame_bytes = jnp.where(pos == nbytes[:, None],
                            (crc[:, None] >> 8).astype(jnp.uint8),
                            frame_bytes)
    frame_bytes = jnp.where(pos == (nbytes + 1)[:, None],
                            (crc[:, None] & 0xFF).astype(jnp.uint8),
                            frame_bytes)

    out = {
        "bytes": frame_bytes,
        "length": nbytes + 2,
        "kind": kind,
        "channel_code": ch_code,
        "subframe_bits": sub_bits,
    }
    if b != b_in:                   # drop the 128-lane pad frames
        out = {k: v[:b_in] for k, v in out.items()}
    return out


# ---------------------------------------------------------------------------
# Host-facing driver


@functools.lru_cache(maxsize=64)
def _jitted_encode(config: EncoderConfig, sharding):
    """One jitted pipeline per (config, sharding) — a stable callable
    identity so repeated ``BatchEncoder`` construction (one per file in
    corpus/CLI use) hits jax's pjit cache instead of re-tracing the
    whole pipeline (~seconds per trace at batch 1024)."""
    if config.conformance:
        from flacx.conformance import encode_batch_conformance
        fn = functools.partial(encode_batch_conformance, config)
    else:
        fn = functools.partial(_encode_batch, config)
    kwargs = {}
    if sharding is not None:
        kwargs["in_shardings"] = (sharding, None)
    return jax.jit(fn, **kwargs)


class BatchEncoder:
    """Jit-compiled batched frame encoder with host assembly."""

    def __init__(self, config: EncoderConfig, batch_frames: int = 32,
                 sharding=None):
        self.config = config
        self.batch_frames = batch_frames
        self._fn = _jitted_encode(config, sharding)

    def encode_batch_device(self, pcm: np.ndarray, first_index: int) -> dict:
        """Run the device pipeline; pcm ``[B, channels, N]`` int32 — or
        int16 when ``bps <= 16`` (halves the host→device PCM transfer;
        the pipeline's first op upcasts in VMEM)."""
        arr = jnp.asarray(pcm)
        if arr.dtype != jnp.int16 or self.config.bps > 16:
            arr = arr.astype(jnp.int32)
        return self._fn(arr, jnp.int64(first_index))

    def encode_batch_indexed(self, pcm: np.ndarray,
                             frame_indices: np.ndarray) -> dict:
        """Run the device pipeline with a per-frame coded-number array.

        Corpus mode mixes frames of many files in one dispatch; each frame
        carries its own index.  ``pcm`` int32 ``[B, channels, N]``,
        ``frame_indices`` int64 ``[B]``.
        """
        return self._fn(jnp.asarray(pcm, jnp.int32),
                        jnp.asarray(frame_indices, jnp.int64))

    def _drain(self, entry: tuple[dict, int],
               stats: dict | None, chunk: np.ndarray | None = None,
               index0: int = 0) -> list[bytes]:
        """Fetch one finished device batch and assemble its frame bytes."""
        from flacx.native import assemble_frames
        result, valid = entry
        if "overflow" not in result and stats is None:
            # narrow-fetch fast path: get the frame lengths first, then
            # only the columns up to this batch's LONGEST frame (bucketed
            # to 1 KiB so slice programs stay cached) — the padded
            # [B, max_frame_bytes] rectangle is sized for the worst legal
            # frame, typically ~1.5× the realized maximum, and the
            # device→host fetch is the e2e wall on link-bound hosts
            lens = np.asarray(result["length"])[:valid]
            full = result["bytes"].shape[-1]
            w = min(full, (int(lens.max()) + 1023) // 1024 * 1024)
            data = np.asarray(result["bytes"][:, :w])[:valid]
            return assemble_frames(data, lens)
        data = np.asarray(result["bytes"])
        lens = np.asarray(result["length"])
        if "overflow" in result and chunk is not None:
            over = np.asarray(result["overflow"])[:valid]
            if over.any():
                # conformance mode: frames whose reference-choice Rice
                # codes exceed the 32-bit packer symbol go through the
                # oracle (byte-identical by its parity proof)
                frames = assemble_frames(data[:valid], lens[:valid])
                from flacx.pipeline import _oracle_frame
                cfg = self.config
                for i in np.nonzero(over)[0]:
                    frames[i] = _oracle_frame(
                        chunk[i].T, index0 + int(i), cfg.bps,
                        cfg.block_size, cfg.max_lpc_order,
                        cfg.qlp_precision, cfg.partition_orders)
                if stats is not None:
                    stats["frame_bytes"] = (stats.get("frame_bytes", 0)
                                            + sum(map(len, frames)))
                return frames
        if stats is not None:
            kinds = np.asarray(result["kind"])[:valid].ravel()
            kh = stats.setdefault("subframe_kinds", {})
            for name, code in (("constant", 0), ("verbatim", 1),
                               ("fixed", 2), ("lpc", 3)):
                kh[name] = kh.get(name, 0) + int((kinds == code).sum())
            codes = np.asarray(result["channel_code"])[:valid]
            mh = stats.setdefault("stereo_modes", {})
            for name, code in (("L/R", 1), ("L/S", 8), ("S/R", 9),
                               ("M/S", 10)):
                mh[name] = mh.get(name, 0) + int((codes == code).sum())
            stats["frame_bytes"] = (stats.get("frame_bytes", 0)
                                    + int(lens[:valid].sum()))
        return assemble_frames(data[:valid], lens[:valid])

    def encode_frame_stream(self, batches, first_index: int = 0,
                            stats: dict | None = None):
        """Encode a stream of block batches, yielding frame byte strings.

        ``batches`` is an iterable of ``[F<=batch_frames, channels, N]``
        full-block groups (short groups are zero-padded to the compiled
        batch shape; pad frames are encoded and discarded).  One device
        batch is kept in flight so host assembly of batch ``i`` overlaps
        the device encode of batch ``i+1`` — memory stays O(batch)
        regardless of stream length, the generator contract of the
        reference encoder (flac/encoder.py:48-165) at batch granularity.

        ``stats``, if given, accumulates per-run observability counters
        (SURVEY.md §5 metrics row): subframe-kind and stereo-mode
        histograms plus total frame bytes.
        """
        from concurrent.futures import ThreadPoolExecutor

        bsz = self.batch_frames
        keep_pcm = self.config.conformance
        index = first_index
        # the drain (device→host fetch + row concat) runs on a worker
        # thread: the fetch is link-wait, so the producer's own host work
        # (PCM staging, MD5, file writes in the consumer of this
        # generator) overlaps it — the double-buffering VERDICT r4 asked
        # for, at two device batches in flight
        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = []
            for chunk in batches:
                valid = chunk.shape[0]
                if valid > bsz:
                    raise ValueError(f"batch group of {valid} frames "
                                     f"exceeds batch_frames={bsz}")
                if valid < bsz:
                    chunk = np.concatenate(
                        [chunk, np.zeros((bsz - valid, *chunk.shape[1:]),
                                         chunk.dtype)], axis=0)
                result = self.encode_batch_device(chunk, index)
                futures.append(pool.submit(
                    self._drain, (result, valid), stats,
                    chunk if keep_pcm else None, index))
                index += valid
                if len(futures) > 2:
                    yield from futures.pop(0).result()
            for fut in futures:
                yield from fut.result()

    def encode_frames(self, pcm: np.ndarray, first_index: int,
                      stats: dict | None = None) -> list[bytes]:
        """Encode ``[F, channels, N]`` full blocks into frame byte strings."""
        bsz = self.batch_frames
        batches = (pcm[s: s + bsz] for s in range(0, pcm.shape[0], bsz))
        return list(self.encode_frame_stream(batches, first_index, stats))
