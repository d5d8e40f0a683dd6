"""Native host-runtime bindings (C++, ctypes; numpy fallback).

``lib()`` returns the loaded library or None.  The library is built on
demand with the system compiler (see ``flacx/native/build.py``); every
caller has a numpy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libflacxhost.so"
_lib = None
_tried = False


def lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = Path(__file__).parent / "hostops.cc"
    stale = (not _LIB_PATH.exists()
             or (src.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
    if stale:
        try:
            from flacx.native.build import build
            build()
        except Exception:
            if not _LIB_PATH.exists():
                return None
    try:
        cdll = ctypes.CDLL(str(_LIB_PATH))
        cdll.flacx_assemble_frames.restype = ctypes.c_int64
        cdll.flacx_assemble_frames.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        cdll.flacx_crc16_rows.restype = None
        cdll.flacx_crc16_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        cdll.flacx_pack24.restype = None
        cdll.flacx_pack24.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p]
        cdll.flacx_scatter_rows.restype = None
        cdll.flacx_scatter_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        cdll.flacx_scan_candidates.restype = ctypes.c_int64
        cdll.flacx_scan_candidates.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        _lib = cdll
    except OSError:
        _lib = None
    return _lib


def assemble_frames(data: np.ndarray, lengths: np.ndarray) -> list[bytes]:
    """Gather ``data[i, :lengths[i]]`` rows; returns per-row byte strings.

    Uses one native pass + zero-copy slicing when the library is present.
    """
    data = np.ascontiguousarray(data, np.uint8)
    lengths = np.ascontiguousarray(lengths, np.int32)
    cdll = lib()
    if cdll is None:
        return [data[i, : lengths[i]].tobytes()
                for i in range(data.shape[0])]
    total = int(lengths.sum())
    out = np.empty(total, np.uint8)
    cdll.flacx_assemble_frames(
        data.ctypes.data, lengths.ctypes.data, data.shape[0],
        data.shape[1], out.ctypes.data)
    blob = out.tobytes()
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return [blob[offsets[i]: offsets[i + 1]]
            for i in range(data.shape[0])]


def assemble_stream(data: np.ndarray, lengths: np.ndarray) -> bytes:
    """Gather rows into ONE contiguous byte string (streaming fast path)."""
    data = np.ascontiguousarray(data, np.uint8)
    lengths = np.ascontiguousarray(lengths, np.int32)
    cdll = lib()
    if cdll is None:
        return b"".join(data[i, : lengths[i]].tobytes()
                        for i in range(data.shape[0]))
    total = int(lengths.sum())
    out = np.empty(total, np.uint8)
    cdll.flacx_assemble_frames(
        data.ctypes.data, lengths.ctypes.data, data.shape[0],
        data.shape[1], out.ctypes.data)
    return out.tobytes()


def crc16_rows(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """CRC-16 of ``data[i, :lengths[i]]`` per row (native or numpy)."""
    cdll = lib()
    if cdll is None:
        from flacx.crc import crc16_batch
        return crc16_batch(np.ascontiguousarray(data, np.uint8),
                           np.asarray(lengths))
    data = np.ascontiguousarray(data, np.uint8)
    lengths = np.ascontiguousarray(lengths, np.int32)
    out = np.empty(data.shape[0], np.uint16)
    cdll.flacx_crc16_rows(data.ctypes.data, lengths.ctypes.data,
                          data.shape[0], data.shape[1], out.ctypes.data)
    return out


def pack24(samples: np.ndarray) -> bytes:
    """Interleaved little-endian 3-byte packing of int32 samples."""
    flat = np.ascontiguousarray(samples.reshape(-1), np.int32)
    cdll = lib()
    if cdll is None:
        u = flat.view(np.uint32) & 0xFFFFFF
        out = np.empty((flat.size, 3), np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        return out.tobytes()
    out = np.empty(flat.size * 3, np.uint8)
    cdll.flacx_pack24(flat.ctypes.data, flat.size, out.ctypes.data)
    return out.tobytes()


def scatter_rows(data: np.ndarray, offs: np.ndarray, ends: np.ndarray,
                 width: int) -> np.ndarray:
    """``rows[i, :ends[i]-offs[i]] = data[offs[i]:ends[i]]``, zero-padded.

    The decode-side inverse of :func:`assemble_frames` — stages a batch of
    variable-length frame byte spans into the device's padded row layout
    in one threaded native pass (numpy fallback: per-row copies).
    """
    offs = np.ascontiguousarray(offs, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    n_rows = offs.shape[0]
    cdll = lib()
    if cdll is None:
        rows = np.zeros((n_rows, width), np.uint8)
        for i, (o, e) in enumerate(zip(offs, ends)):
            rows[i, : e - o] = data[o:e]
        return rows
    data = np.ascontiguousarray(data, np.uint8)
    rows = np.empty((n_rows, width), np.uint8)
    cdll.flacx_scatter_rows(data.ctypes.data, offs.ctypes.data,
                            ends.ctypes.data, n_rows, rows.ctypes.data,
                            width)
    return rows


def scan_candidates(data: np.ndarray, first: int
                    ) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None":
    """Native frame-boundary candidate scan (see flacx.decoder).

    Returns ``(offsets, numbers, strategies, block_sizes)`` with the same
    semantics as the vectorized numpy scan, or None when the library is
    unavailable (caller falls back).
    """
    cdll = lib()
    if cdll is None or not hasattr(cdll, "flacx_scan_candidates"):
        return None
    data = np.ascontiguousarray(data, np.uint8)
    lim = data.size - 6
    if lim <= first:
        e = np.asarray([], np.int64)
        return e, e, np.asarray([], np.int64), e
    cap = int(np.count_nonzero(data[first:lim] == 0xFF))
    if cap == 0:
        e = np.asarray([], np.int64)
        return e, e, np.asarray([], np.int64), e
    offs = np.empty(cap, np.int64)
    nums = np.empty(cap, np.int64)
    strats = np.empty(cap, np.int32)
    bsizes = np.empty(cap, np.int64)
    cnt = cdll.flacx_scan_candidates(
        data.ctypes.data, data.size, first, offs.ctypes.data,
        nums.ctypes.data, strats.ctypes.data, bsizes.ctypes.data, cap)
    return (offs[:cnt], nums[:cnt], strats[:cnt].astype(np.int64),
            bsizes[:cnt])


class ScannedFrames:
    """Structure-of-arrays output of the C++ walker (device decode path)."""

    __slots__ = ("channel_code", "kind", "order", "shift", "wasted", "po",
                 "width", "taps", "warmup", "const_val", "ckpt_pos",
                 "ckpt_param", "ckpt_esc", "ckpt_inesc", "ckpt_state",
                 "end_bits", "ckpt_interval", "state_interval", "fbps")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def scan_frames(data: np.ndarray, start_bits: np.ndarray, block_size: int,
                channels: int, bps: int, ckpt_interval: int = 64,
                state_interval: int = 0) -> "ScannedFrames | None":
    """Run the C++ structure walker over a batch of equal-size frames.

    Parses headers/taps/warmup and checkpoints the residual bit cursor
    every ``ckpt_interval`` samples; residual VALUES are decoded on the
    device (flacx/ops/bitunpack.py).  With ``state_interval > 0`` the
    walker additionally runs the integer reconstruction IIR inline and
    emits the last-32-samples window before every ``state_interval``
    boundary (``ckpt_state [F, C, Ks, 32]`` int32) so the device can
    reconstruct all chunks of a batch in parallel — only valid when
    sample values fit int32 (``bps + 1 <= 31``).  Returns None when the
    native library is unavailable; raises ValueError on malformed input.
    """
    import ctypes

    cdll = lib()
    if cdll is None or not hasattr(cdll, "flacx_scan_frames"):
        return None
    f = data.shape[0]
    n, c, s = block_size, channels, ckpt_interval
    ss = state_interval
    k = (n + s - 1) // s
    ks = (n + ss - 1) // ss if ss > 0 else 0
    data = np.ascontiguousarray(data, np.uint8)
    start = np.ascontiguousarray(start_bits, np.int64)
    out = ScannedFrames(
        channel_code=np.zeros(f, np.int32),
        kind=np.zeros((f, c), np.int32),
        order=np.zeros((f, c), np.int32),
        shift=np.zeros((f, c), np.int32),
        wasted=np.zeros((f, c), np.int32),
        po=np.zeros((f, c), np.int32),
        width=np.zeros((f, c), np.int32),
        taps=np.zeros((f, c, 32), np.int32),
        warmup=np.zeros((f, c, 32), np.int64),
        const_val=np.zeros((f, c), np.int64),
        ckpt_pos=np.zeros((f, c, k), np.int32),
        ckpt_param=np.zeros((f, c, k), np.int32),
        ckpt_esc=np.zeros((f, c, k), np.int32),
        ckpt_inesc=np.zeros((f, c, k), np.int32),
        ckpt_state=(np.zeros((f, c, ks, 32), np.int32) if ss > 0 else None),
        end_bits=np.zeros(f, np.int64),
        ckpt_interval=s,
        state_interval=ss,
        fbps=np.zeros(f, np.int32))

    cdll.flacx_scan_frames.restype = ctypes.c_int64
    rc = cdll.flacx_scan_frames(
        ctypes.c_void_p(data.ctypes.data), ctypes.c_int64(f),
        ctypes.c_int64(data.shape[1]),
        ctypes.c_void_p(start.ctypes.data),
        ctypes.c_int32(n), ctypes.c_int32(c), ctypes.c_int32(bps),
        ctypes.c_int32(s), ctypes.c_int32(ss),
        ctypes.c_void_p(out.channel_code.ctypes.data),
        ctypes.c_void_p(out.kind.ctypes.data),
        ctypes.c_void_p(out.order.ctypes.data),
        ctypes.c_void_p(out.shift.ctypes.data),
        ctypes.c_void_p(out.wasted.ctypes.data),
        ctypes.c_void_p(out.po.ctypes.data),
        ctypes.c_void_p(out.width.ctypes.data),
        ctypes.c_void_p(out.taps.ctypes.data),
        ctypes.c_void_p(out.warmup.ctypes.data),
        ctypes.c_void_p(out.const_val.ctypes.data),
        ctypes.c_void_p(out.ckpt_pos.ctypes.data),
        ctypes.c_void_p(out.ckpt_param.ctypes.data),
        ctypes.c_void_p(out.ckpt_esc.ctypes.data),
        ctypes.c_void_p(out.ckpt_inesc.ctypes.data),
        ctypes.c_void_p(out.ckpt_state.ctypes.data if ss > 0 else None),
        ctypes.c_void_p(out.end_bits.ctypes.data),
        ctypes.c_void_p(out.fbps.ctypes.data))
    if rc != 0:
        raise ValueError(f"frame scan error in row {int(rc) - 1}")
    return out
