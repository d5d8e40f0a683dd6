"""Vectorized (lockstep) FLAC frame parsing on the host.

The decode grammar is bit-serial *within* a frame but frames are
independent, so a batch of F frames is parsed in lockstep: one cursor per
frame, every grammar step executed once as a numpy op over ``[F]`` lanes
(masked where lanes diverge).  This replaces the reference's per-bit Python
reader (flac/binary.py:97-127, flac/decoder.py:414-421) with
O(grammar-steps) numpy dispatches independent of the number of frames.

Output arrays feed the device reconstruction kernel
(``flacx.ops.reconstruct``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import flacx.coded_number as coded_number
from flacx.format import Channels


def _clz32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    return np.where(x == 0, 32,
                    31 - np.floor(np.log2(x.astype(np.float64) + 0.5))
                    .astype(np.int64)).astype(np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)
    return np.where(hi != 0, _clz32(hi), 32 + _clz32(lo))


class VectorBitReader:
    """One MSB-first bit cursor per row over a shared byte matrix."""

    def __init__(self, data: np.ndarray, start_bits: np.ndarray):
        # pad so 8-byte windows never run off the end
        self.data = np.pad(data, ((0, 0), (0, 8)))
        self.pos = start_bits.astype(np.int64).copy()
        self._rows = np.arange(data.shape[0])

    def _window(self) -> np.ndarray:
        """Next 64 bits at each cursor (MSB-first), minus sub-byte offset."""
        byte0 = (self.pos >> 3).astype(np.int64)
        byte0 = np.minimum(byte0, self.data.shape[1] - 9)
        cols = byte0[:, None] + np.arange(8)
        chunk = self.data[self._rows[:, None], cols].astype(np.uint64)
        shifts = np.uint64(56) - np.arange(8, dtype=np.uint64) * np.uint64(8)
        win = (chunk << shifts).sum(axis=1, dtype=np.uint64)
        sh = (self.pos & 7).astype(np.uint64)
        return (win << sh) | np.where(
            sh > 0,
            self.data[self._rows, byte0 + 8].astype(np.uint64)
            >> (np.uint64(8) - sh), 0).astype(np.uint64)

    def read(self, nbits) -> np.ndarray:
        """Read up to 56 bits per row; per-row widths allowed, 0 = skip."""
        n = np.asarray(nbits, dtype=np.int64)
        n = np.broadcast_to(n, self.pos.shape)
        win = self._window()
        shift = (np.uint64(64) - n.astype(np.uint64)) & np.uint64(63)
        val = np.where(n > 0, win >> shift, 0)
        self.pos += n
        return val.astype(np.int64)

    def read_signed(self, nbits) -> np.ndarray:
        n = np.broadcast_to(np.asarray(nbits, dtype=np.int64), self.pos.shape)
        x = self.read(n)
        sign = (x >> np.maximum(n - 1, 0)) & np.where(n > 0, 1, 0)
        return x - (sign << n)

    def read_unary(self, active: np.ndarray) -> np.ndarray:
        """Count zeros to (and consume) the next 1 bit, per active row."""
        q = np.zeros(self.pos.shape, np.int64)
        live = active.copy()
        limit = self.data.shape[1] // 8 + 2
        for _ in range(limit):
            if not live.any():
                return q
            win = self._window()
            lz = _clz64(win)
            full = live & (lz >= 64)
            done = live & (lz < 64)
            q += np.where(full, 64, 0) + np.where(done, lz, 0)
            self.pos += np.where(full, 64, np.where(done, lz + 1, 0))
            live = full
        raise ValueError("unterminated unary code (corrupt stream)")


class ParsedFrames(NamedTuple):
    """Structure-of-arrays for F parsed frames (C coded channels)."""
    channel_code: np.ndarray   # [F]
    kind: np.ndarray           # [F, C] 0=const 1=verb 2=fixed 3=lpc
    order: np.ndarray          # [F, C]
    shift: np.ndarray          # [F, C]
    taps: np.ndarray           # [F, C, 32]
    wasted: np.ndarray         # [F, C]
    residual: np.ndarray       # [F, C, N] int64 (warmup at i<order;
    #                            constants replicated; verbatim raw)
    end_bits: np.ndarray       # [F] cursor after last subframe (pre-padding)


def parse_frames(data: np.ndarray, start_bits: np.ndarray, block_size: int,
                 channels: int, bps: int) -> ParsedFrames:
    """Parse F equal-block-size frames (native C++ runtime when available,
    lockstep numpy otherwise).

    Args:
      data: ``[F, L]`` u8 — each row holds (at least) one whole frame.
      start_bits: ``[F]`` bit offset of each frame's sync code in its row.
      block_size / channels / bps: stream parameters (from Streaminfo).
    """
    native = _parse_frames_native(data, start_bits, block_size, channels,
                                  bps)
    if native is not None:
        return native
    return parse_frames_numpy(data, start_bits, block_size, channels, bps)


def _parse_frames_native(data, start_bits, block_size, channels, bps
                         ) -> ParsedFrames | None:
    from flacx.native import lib
    cdll = lib()
    if cdll is None or not hasattr(cdll, "flacx_parse_frames"):
        return None
    import ctypes

    f = data.shape[0]
    data = np.ascontiguousarray(data, np.uint8)
    start = np.ascontiguousarray(start_bits, np.int64)
    channel_code = np.zeros(f, np.int32)
    kind = np.zeros((f, channels), np.int32)
    order = np.zeros((f, channels), np.int32)
    shift = np.zeros((f, channels), np.int32)
    wasted = np.zeros((f, channels), np.int32)
    taps = np.zeros((f, channels, 32), np.int32)
    residual = np.zeros((f, channels, block_size), np.int64)
    end_bits = np.zeros(f, np.int64)

    cdll.flacx_parse_frames.restype = ctypes.c_int64
    rc = cdll.flacx_parse_frames(
        ctypes.c_void_p(data.ctypes.data), ctypes.c_int64(f),
        ctypes.c_int64(data.shape[1]),
        ctypes.c_void_p(start.ctypes.data),
        ctypes.c_int32(block_size), ctypes.c_int32(channels),
        ctypes.c_int32(bps),
        ctypes.c_void_p(channel_code.ctypes.data),
        ctypes.c_void_p(kind.ctypes.data),
        ctypes.c_void_p(order.ctypes.data),
        ctypes.c_void_p(shift.ctypes.data),
        ctypes.c_void_p(wasted.ctypes.data),
        ctypes.c_void_p(taps.ctypes.data),
        ctypes.c_void_p(residual.ctypes.data),
        ctypes.c_void_p(end_bits.ctypes.data),
        ctypes.c_void_p(None))
    if rc != 0:
        raise ValueError(f"frame parse error in row {int(rc) - 1}")
    return ParsedFrames(channel_code=channel_code,
                        kind=kind.astype(np.int64),
                        order=order.astype(np.int64),
                        shift=shift.astype(np.int64),
                        taps=taps.astype(np.int64), wasted=wasted,
                        residual=residual, end_bits=end_bits)


def parse_frames_numpy(data: np.ndarray, start_bits: np.ndarray,
                       block_size: int, channels: int,
                       bps: int) -> ParsedFrames:
    """Lockstep numpy fallback parser."""
    f = data.shape[0]
    n = block_size
    r = VectorBitReader(data, start_bits)

    # ---- frame header ----------------------------------------------------
    r.read(15)                      # sync (validated by the offset scanner)
    r.read(1)                       # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)
    # per-frame sample-size override (reference flac/decoder.py:186-229;
    # code 0 = from streaminfo, 3 reserved)
    if (ss_code == 3).any():
        raise ValueError("reserved sample-size code in frame header")
    _SS_LUT = np.array([0, 8, 12, 0, 16, 20, 24, 32], np.int64)
    fbps = np.where(ss_code == 0, bps, _SS_LUT[ss_code])

    b0 = r.read(8)
    extra_tab = np.array([coded_number.following_bytes(v)
                          for v in range(256)], np.int64)
    extra = extra_tab[b0]
    for t in range(1, 7):
        r.read(np.where(extra >= t, 8, 0))

    bs_extra = np.where(bs_code == 0b0110, 8,
                        np.where(bs_code == 0b0111, 16, 0))
    r.read(bs_extra)
    sr_extra = np.where(sr_code == 0b1100, 8,
                        np.where((sr_code == 0b1101) | (sr_code == 0b1110),
                                 16, 0))
    r.read(sr_extra)
    r.read(8)                       # header CRC (validated by the scanner)

    decorr_bit = np.zeros((f, channels), np.int64)
    if channels == 2:
        decorr_bit[:, 0] = (ch_code == int(Channels.S_R))
        decorr_bit[:, 1] = ((ch_code == int(Channels.L_S))
                            | (ch_code == int(Channels.M_S)))

    kind = np.zeros((f, channels), np.int64)
    order = np.zeros((f, channels), np.int64)
    shift = np.zeros((f, channels), np.int64)
    taps = np.zeros((f, channels, 32), np.int64)
    wasted = np.zeros((f, channels), np.int64)
    residual = np.zeros((f, channels, n), np.int64)

    fixed_taps = np.zeros((5, 32), np.int64)
    from flacx.format import FIXED_PREDICTOR_COEFFICIENTS
    for o, cs in enumerate(FIXED_PREDICTOR_COEFFICIENTS):
        fixed_taps[o, :len(cs)] = cs

    for c in range(channels):
        r.read(1)
        type_code = r.read(6)
        wflag = r.read(1)
        w = r.read_unary(wflag == 1) + np.where(wflag == 1, 1, 0)
        wasted[:, c] = w

        is_const = type_code == 0
        is_verb = type_code == 1
        is_fixed = (type_code >= 0b001000) & (type_code <= 0b001100)
        is_lpc = type_code >= 0b100000
        reserved = ~(is_const | is_verb | is_fixed | is_lpc)
        if reserved.any():
            raise ValueError(
                f"reserved subframe type code in row "
                f"{int(np.nonzero(reserved)[0][0])}")
        k = np.where(is_const, 0, np.where(is_verb, 1,
                                           np.where(is_fixed, 2, 3)))
        o = np.where(is_fixed, type_code & 7,
                     np.where(is_lpc, (type_code & 31) + 1, 0))
        kind[:, c] = k
        order[:, c] = o
        eff_bps = fbps + decorr_bit[:, c] - w

        # constant: one sample, replicated
        cval = r.read_signed(np.where(is_const, eff_bps, 0))
        residual[:, c, :] = np.where(is_const, cval, 0)[:, None]

        # warmup samples (orders ≤ 32)
        for t in range(32):
            v = r.read_signed(np.where((k >= 2) & (t < o), eff_bps, 0))
            sel = (k >= 2) & (t < o)
            residual[sel, c, t] = v[sel]

        # LPC meta + coefficients
        prec_code = r.read(np.where(is_lpc, 4, 0))
        if (is_lpc & (prec_code == 15)).any():
            raise ValueError("invalid LPC precision code 15")
        prec = prec_code + 1
        sh = r.read_signed(np.where(is_lpc, 5, 0))
        # the shift field is coded signed but RFC 9639 forbids negatives;
        # a negative value reaching jnp.right_shift would be undefined
        if (is_lpc & (sh < 0)).any():
            raise ValueError("negative LPC shift (forbidden by RFC 9639)")
        shift[:, c] = sh
        for t in range(32):
            v = r.read_signed(np.where(is_lpc & (t < o), prec, 0))
            sel = is_lpc & (t < o)
            taps[sel, c, t] = v[sel]
        fsel = k == 2
        taps[fsel, c, :] = fixed_taps[order[fsel, c]]

        # residual coding
        pred = k >= 2
        method = r.read(np.where(pred, 2, 0))
        if (pred & (method > 1)).any():
            raise ValueError("reserved residual coding method")
        width = np.where(method == 0, 4, 5)
        po = r.read(np.where(pred, 4, 0))
        bad_po = pred & ((n % (1 << po) != 0) | ((n >> po) <= o))
        if bad_po.any():
            raise ValueError("invalid Rice partition order for block size")
        psize = np.where(pred, n >> po, n).astype(np.int64)
        escape_val = (1 << width) - 1

        param = np.zeros(f, np.int64)
        esc_size = np.zeros(f, np.int64)
        in_escape = np.zeros(f, bool)
        for j in range(n):
            at_start = pred & ((j == o) | ((j > 0) & (j % psize == 0)))
            p = r.read(np.where(at_start, width, 0))
            is_esc = at_start & (p == escape_val)
            in_escape = np.where(at_start, is_esc, in_escape)
            param = np.where(at_start, p, param)
            esc_size = np.where(is_esc, r.read(np.where(is_esc, 5, 0)),
                                esc_size)

            rice_now = pred & (j >= o) & ~in_escape
            q = r.read_unary(rice_now)
            rem = r.read(np.where(rice_now, param, 0))
            u = (q << param) | rem
            val = (u >> 1) ^ -(u & 1)

            esc_now = pred & (j >= o) & in_escape
            vesc = r.read_signed(np.where(esc_now, esc_size, 0))
            verb_now = k == 1
            vverb = r.read_signed(np.where(verb_now, eff_bps, 0))

            out = np.where(rice_now, val,
                           np.where(esc_now, vesc,
                                    np.where(verb_now, vverb, 0)))
            upd = rice_now | esc_now | verb_now
            residual[upd, c, j] = out[upd]

    return ParsedFrames(channel_code=np.asarray(ch_code), kind=kind,
                        order=order, shift=shift, taps=taps, wasted=wasted,
                        residual=residual, end_bits=r.pos.copy())
