"""Batched TPU-native FLAC decoder.

Three phases (SURVEY.md §7 step 5 / hard part #2 — the sequential decode
grammar is split so only the cheap part stays serial):

1. **Frame boundary scan** (host, vectorized): candidate frame starts are
   byte positions matching the 14-bit sync pattern whose header parses and
   whose CRC-8 matches — a strong (~2^-30 false positive) filter evaluated
   for all offsets at once; candidates are then chained by their coded
   frame numbers.  No residual decoding is needed to find boundaries.
2. **Lockstep payload parse** (host, numpy): all frames of a batch advance
   through the subframe grammar together (``flacx.hostdec``).
3. **Reconstruction** (device): one ``lax.scan`` rebuilds every subframe's
   IIR in parallel over the batch, followed by stereo undecorrelation and
   wasted-bits restore (``flacx.ops.reconstruct``).

Variable-blocking / mixed-block-size streams batch-decode too: frames are
grouped by block size and each group runs the same fused device pipeline,
scattered to cumulative sample positions (:func:`_decode_variable`).
Frames the batch paths cannot handle (the short final block, tiny groups,
scan rejections) fall back to the strict oracle decoder.
"""

from __future__ import annotations

import io
import numpy as np

import flacx.coded_number as _cn
from flacx.bitio import BitReader
from flacx.crc import crc8, crc16
from flacx.format import MAGIC, MetadataBlockType, Streaminfo
from flacx.oracle.decoder import (FlacFormatError, read_frame,
                                  read_metadata_header, read_streaminfo)


def parse_stream_header(data: bytes) -> tuple[Streaminfo, int]:
    """Parse magic + metadata blocks; return (streaminfo, first frame byte)."""
    r = BitReader(data)
    if r.read_bytes(4) != MAGIC:
        raise FlacFormatError("not a FLAC stream")
    streaminfo = None
    while True:
        header = read_metadata_header(r)
        if header.type == MetadataBlockType.Streaminfo:
            streaminfo = read_streaminfo(r)
        else:
            r.read_bytes(header.length)
        if header.last:
            break
    if streaminfo is None:
        raise FlacFormatError("missing streaminfo")
    return streaminfo, r.bit_position // 8


#: coded-number continuation-byte count for each possible lead byte
#: (flacx.coded_number.following_bytes as a LUT for the vectorized scan)
_CN_EXTRA = np.array([_cn.following_bytes(b) for b in range(256)], np.int64)


#: block size per 4-bit header code (0 = reserved, 6/7 = uncommon forms
#: resolved from the trailing bytes; flacx.format.BLOCK_SIZE_ENCODING)
_BS_LUT = np.array([0, 192, 576, 1152, 2304, 4608, 0, 0,
                    256, 512, 1024, 2048, 4096, 8192, 16384, 32768],
                   np.int64)


def _scan_candidates(arr: np.ndarray, first: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Vectorized sync + header-CRC-8 candidate filter.

    Replaces the per-candidate Python loop (byte-serial ``crc8`` per
    candidate) with lock-step numpy over ALL candidates at once: header
    lengths from LUTs, CRC-8 via a 15-step table walk with per-candidate
    freeze, coded numbers via a 6-step continuation fold.  Semantics are
    identical to the scalar form (same survivors, numbers, strategies).

    Returns ``(offsets, numbers, strategies, block_sizes)`` of surviving
    candidates; block sizes are decoded from each header (incl. the
    8/16-bit uncommon forms), so variable-blocking chains need no prior
    block-size knowledge.

    Runs in the C++ host runtime when available (one threaded pass,
    ~10× the numpy lock-step walk below, which remains the fallback and
    the semantics oracle — ``tests/test_native.py`` asserts equality).
    """
    from flacx.native import scan_candidates as native_scan
    nat = native_scan(arr, first)
    if nat is not None:
        return nat

    from flacx.crc import crc_table
    from flacx.format import CRC8_POLYNOMIAL

    # a frame needs >= 6 header bytes + subframe + CRC-16 after the sync;
    # tiny final frames (e.g. all-constant silence) sit close to the end
    lim = len(arr) - 6
    if lim <= first:
        return (np.asarray([], np.int64),) * 4
    cand = (np.nonzero((arr[first:lim] == 0xFF)
                       & ((arr[first + 1:lim + 1] & 0xFE) == 0xF8))[0]
            + first).astype(np.int64)
    if not cand.size:
        return (np.asarray([], np.int64),) * 4

    b0 = arr[cand + 4].astype(np.int64)
    extra = _CN_EXTRA[b0]
    code = arr[cand + 2]
    bs_code = code >> 4
    sr_code = code & 0xF
    hdr_len = (5 + extra
               + np.where(bs_code == 0b0110, 1,
                          np.where(bs_code == 0b0111, 2, 0))
               + np.where(sr_code == 0b1100, 1,
                          np.where((sr_code == 0b1101)
                                   | (sr_code == 0b1110), 2, 0)))
    ok = cand + hdr_len < len(arr)

    # CRC-8 over the variable-length header (≤ 15 bytes), all candidates
    # in lock-step; rows past their length freeze
    table8 = crc_table(8, CRC8_POLYNOMIAL)
    crc = np.zeros(cand.shape, np.uint32)
    last = len(arr) - 1
    for i in range(15):
        byte = arr[np.minimum(cand + i, last)].astype(np.uint32)
        active = ok & (i < hdr_len)
        crc = np.where(active, table8[byte ^ crc], crc)
    ok &= arr[np.minimum(cand + hdr_len, last)] == crc

    # coded-number decode (flacx.coded_number.decode, vectorized)
    num = np.where(extra == 0, b0, b0 & (0xFF >> (extra + 2)))
    for i in range(1, 7):
        cont = arr[np.minimum(cand + 4 + i, last)].astype(np.int64)
        act = i <= extra
        ok &= ~act | ((cont & 0xC0) == 0x80)
        num = np.where(act, (num << 6) | (cont & 0x3F), num)

    # per-candidate block size: LUT for the common codes, trailing bytes
    # (which sit right after the coded number) for the uncommon forms
    bsize = _BS_LUT[bs_code]
    ok &= bs_code != 0                       # reserved code
    pos_bs = np.minimum(cand + 5 + extra, last)
    u8 = arr[pos_bs].astype(np.int64) + 1
    u16 = ((arr[pos_bs].astype(np.int64) << 8)
           | arr[np.minimum(pos_bs + 1, last)]) + 1
    bsize = np.where(bs_code == 0b0110, u8,
                     np.where(bs_code == 0b0111, u16, bsize))

    strat = arr[cand + 1].astype(np.int64) & 1
    return cand[ok], num[ok], strat[ok], bsize[ok]


def _scan_frame_chain(data: bytes, first: int
                      ) -> tuple[np.ndarray, np.ndarray, bool]:
    """Find frame boundaries via sync + CRC-8 candidate filtering.

    Returns ``(offsets, block_sizes, ambiguous)``: byte offsets of
    validated frame headers in ascending order, each frame's block size
    (decoded from its own header), and whether any boundary had to be
    picked heuristically (a duplicated coded number that CRC-16 of the
    previous frame span could not uniquely resolve) — callers that skip
    CRC verification must re-enable it for such scans.

    A candidate survives only if its header parses and its CRC-8 matches
    (a ~2^-30 false-positive filter); survivors are chained by their coded
    frame/sample numbers: fixed blocking counts frames (+1), variable
    blocking counts samples (+ the frame's own block size).  The first
    frame may carry any starting number (a stream cut mid-file still
    batch-decodes).
    """
    arr = np.frombuffer(data, np.uint8)
    offs, nums, strats, bss = _scan_candidates(arr, first)
    empty = np.asarray([], np.int64)
    if not offs.size:
        return empty, empty, False

    # RFC 9639 requires one blocking strategy per stream, so the first
    # (genuine) frame's bit is authoritative and candidates carrying the
    # other bit are false syncs — dropped, not a reason to abandon the
    # scan.
    strategy = int(strats[0])
    keep = strats == strategy
    offs, nums, bss = offs[keep], nums[keep], bss[keep]
    step = bss if strategy == 1 else np.ones_like(bss)

    # fast path (the overwhelmingly common shape): every survivor is a
    # real boundary — numbers form exactly the stride chain
    if offs.size and bool(np.all(nums[1:] == nums[:-1] + step[:-1])):
        return offs, bss, False

    by_num: dict[int, list[tuple[int, int]]] = {}
    for off, num, bs in zip(offs.tolist(), nums.tolist(), bss.tolist()):
        by_num.setdefault(num, []).append((off, bs))

    # A CRC-8-passing false sync whose junk coded number collides with a
    # real frame number becomes MORE likely with file size (~2^-30 per
    # payload byte·frame), so ambiguity must be resolved locally, not by
    # abandoning the batch path: the true boundary is the candidate that
    # closes the PREVIOUS frame with a valid CRC-16 (first frame: the
    # stream's first payload byte).  A surviving wrong pick is still
    # caught by the batch CRC-16 check, which falls back to the
    # sequential decoder — exactness never depends on this scan.
    chain: list[int] = []
    chain_bs: list[int] = []
    ambiguous = False
    expected = int(nums[0])
    last_off = first - 1
    while True:
        alts = [ob for ob in by_num.get(expected, []) if ob[0] > last_off]
        if not alts:
            break
        if len(alts) > 1:
            if chain:
                prev = chain[-1]
                good = [(o, b) for o, b in alts
                        if crc16(data[prev:o - 2])
                        == int.from_bytes(data[o - 2:o], "big")]
            else:
                good = [(o, b) for o, b in alts if o == first]
            if len(good) != 1:
                # no (or several) candidates close the previous frame —
                # the pick below is a guess, not a verified boundary
                ambiguous = True
            alts = good or alts
        off, bs = alts[0]
        chain.append(off)
        chain_bs.append(bs)
        last_off = off
        expected += bs if strategy == 1 else 1
    return (np.asarray(chain, np.int64), np.asarray(chain_bs, np.int64),
            ambiguous)


def _scan_frame_offsets(data: bytes, first: int,
                        block_size: int | None = None
                        ) -> tuple[np.ndarray, bool]:
    """Offsets + ambiguity wrapper of :func:`_scan_frame_chain`.

    ``block_size`` is accepted for signature compatibility but unused:
    block sizes now come from each candidate's own header.
    """
    del block_size
    offsets, _, ambiguous = _scan_frame_chain(data, first)
    return offsets, ambiguous


def scan_frame_offsets(data: bytes, first: int,
                       block_size: int | None = None) -> np.ndarray:
    """Offsets-only wrapper of :func:`_scan_frame_chain`."""
    return _scan_frame_offsets(data, first, block_size)[0]


def frame_headers(data: bytes) -> dict:
    """Per-frame header metadata of a whole stream (vectorized).

    The reference materializes a header object per frame with the
    frame's OWN rate/size/blocking fields (flac/decoder.py:133-229);
    the batch path resolved boundaries but only surfaced the per-frame
    sample-size override.  This returns every per-frame field — so
    foreign streams whose frame headers disagree with Streaminfo
    round-trip their metadata, not just their PCM (VERDICT r4 item 8).

    Returns a dict of equal-length numpy arrays:
      ``offset`` (byte position), ``number`` (coded frame/sample
      number), ``blocking_strategy`` (0 fixed / 1 variable),
      ``block_size``, ``sample_rate``, ``bps`` (streaminfo-resolved),
      ``channel_code`` (raw 4-bit field).
    """
    from flacx.format import (SAMPLE_RATE_DECODING, SAMPLE_SIZE_DECODING,
                              SAMPLE_RATE_FROM_STREAMINFO,
                              SAMPLE_RATE_UNCOMMON8_KHZ,
                              SAMPLE_RATE_UNCOMMON16_HZ,
                              SAMPLE_RATE_UNCOMMON16_DAHZ)

    streaminfo, first = parse_stream_header(data)
    offsets, numbers, strategies, block_sizes = \
        _scan_frame_chain_full(data, first)
    arr = np.frombuffer(data, np.uint8)
    last = len(arr) - 1
    code = arr[np.minimum(offsets + 2, last)]
    sr_code = (code & 0xF).astype(np.int64)
    chsz = arr[np.minimum(offsets + 3, last)]
    ch_code = (chsz >> 4).astype(np.int64)
    sz_code = ((chsz >> 1) & 7).astype(np.int64)

    # uncommon-form rate bytes sit after the coded number and any
    # uncommon block-size bytes
    b0 = arr[np.minimum(offsets + 4, last)].astype(np.int64)
    extra = _CN_EXTRA[b0]
    bs_code = (code >> 4).astype(np.int64)
    bs_extra = np.where(bs_code == 0b0110, 1,
                        np.where(bs_code == 0b0111, 2, 0))
    rate_pos = offsets + 4 + extra + 1 + bs_extra
    r8 = arr[np.minimum(rate_pos, last)].astype(np.int64)
    r16 = (r8 << 8) | arr[np.minimum(rate_pos + 1, last)].astype(np.int64)

    rate_tab = np.zeros(16, np.int64)
    for k, v in SAMPLE_RATE_DECODING.items():
        rate_tab[k] = v
    rate = rate_tab[sr_code]
    rate = np.where(sr_code == SAMPLE_RATE_FROM_STREAMINFO,
                    streaminfo.sample_rate, rate)
    rate = np.where(sr_code == SAMPLE_RATE_UNCOMMON8_KHZ, r8 * 1000, rate)
    rate = np.where(sr_code == SAMPLE_RATE_UNCOMMON16_HZ, r16, rate)
    rate = np.where(sr_code == SAMPLE_RATE_UNCOMMON16_DAHZ, r16 * 10,
                    rate)

    size_tab = np.zeros(8, np.int64)
    for k, v in SAMPLE_SIZE_DECODING.items():
        size_tab[k] = v
    bps = size_tab[sz_code]
    bps = np.where(sz_code == 0, streaminfo.sample_size, bps)

    return {
        "offset": offsets,
        "number": numbers,
        "blocking_strategy": strategies,
        "block_size": block_sizes,
        "sample_rate": rate,
        "bps": bps,
        "channel_code": ch_code,
    }


def _scan_frame_chain_full(data: bytes, first: int):
    """(offsets, numbers, strategies, block_sizes) of the resolved chain
    — chain offsets joined back to their candidate-scan fields."""
    arr = np.frombuffer(data, np.uint8)
    offs, nums, strats, _bss = _scan_candidates(arr, first)
    chain, chain_bs, _amb = _scan_frame_chain(data, first)
    if not chain.size:
        e = np.asarray([], np.int64)
        return e, e, e, e
    idx = np.searchsorted(offs, chain)
    return chain, nums[idx], strats[idx], chain_bs


#: jit cache for the fused device decode pipeline, keyed on every static
#: that shapes the program (block size, channels, bps, checkpoint
#: interval, row width bucket is implicit in the traced shapes).
_DEVICE_FNS: dict = {}

#: minimum host core count for the walker's inline-IIR sample-state
#: checkpoints (chunk-parallel LPC reconstruction) to pay for themselves:
#: the walker threads across rows, so with enough cores the extra serial
#: cost vanishes, while on a 1-core host it would throttle the whole
#: pipeline for a device-side win that was never the bottleneck.
CHUNK_STATE_MIN_CORES = 4


def _device_decode_fn(n: int, c: int, bps: int, s: int, t: int,
                      span_words: int, use_i32: bool, verify_crc: bool,
                      sharding=None, fixed_max: int | None = None,
                      state_ss: int = 0):
    """Build (and cache) the jitted rows→PCM decode pipeline.

    One fused XLA program: byte rows → u32 words → parallel bit-unpack
    (``flacx.ops.bitunpack``) → warmup/constant merge → IIR
    reconstruction → stereo undecorrelation → wasted-bits restore →
    device CRC-16 verification (``flacx.ops.crcfold``).

    ``fixed_max`` (static) is set when the whole batch is
    constant/verbatim/fixed subframes: reconstruction then runs as
    ``fixed_max`` nested masked cumsums (fully parallel) instead of the
    sample-serial scan — fixed predictors are finite differences, so no
    IIR is needed.

    ``state_ss`` (static, > 0) enables chunk-parallel LPC reconstruction
    from the walker's sample-state checkpoints: the scan shrinks to
    ``state_ss`` serial steps over ``n/state_ss``× more lanes
    (``flacx.ops.reconstruct.reconstruct_predicted_chunks``).

    ``sharding`` (a NamedSharding over the leading frame axis) runs the
    decode data-parallel over a device mesh — every input is per-frame,
    so the only collectives are the scalar err/crc all-reduces.
    """
    key = (n, c, bps, s, t, span_words, use_i32, verify_crc, sharding,
           fixed_max, state_ss)
    if key in _DEVICE_FNS:
        return _DEVICE_FNS[key]
    import jax
    import jax.numpy as jnp

    from flacx.ops.bitunpack import bytes_to_words, parse_residual_chunks
    from flacx.ops.crcfold import crc16_over_rows
    from flacx.ops.reconstruct import (reconstruct_fixed_parallel,
                                       reconstruct_predicted,
                                       reconstruct_predicted_chunks,
                                       undo_decorrelation)

    def fn(rows, lens, channel_code, kind, order, shift, wasted, po, width,
           taps, warmup, const_val, ckpt_pos, ckpt_param, ckpt_esc,
           ckpt_inesc, ckpt_state=None):
        words = bytes_to_words(rows)
        vals, err = parse_residual_chunks(
            words, ckpt_pos, ckpt_param, ckpt_esc, ckpt_inesc, kind, order,
            po, width, n, s, span_words)
        i = jnp.arange(n, dtype=jnp.int32)
        warm = warmup[..., : min(32, n)]
        if n > warm.shape[-1]:
            warm = jnp.pad(warm,
                           ((0, 0), (0, 0), (0, n - warm.shape[-1])))
        res = jnp.where(i < order[..., None], warm, vals)
        res = jnp.where((kind == 0)[..., None], const_val[..., None], res)
        if use_i32:
            # int32 reconstruction is only exact while values stay small;
            # anomalously large residuals punt the batch to the i64 host
            # path via the error flag
            err = err | jnp.any(jnp.abs(vals) > (1 << min(bps + 3, 29)))
        if fixed_max is not None:
            x = reconstruct_fixed_parallel(
                res, order, fixed_max,
                dtype=jnp.int32 if use_i32 else jnp.int64)
        elif state_ss > 0:
            x = reconstruct_predicted_chunks(
                res, taps[:, :, :t], shift, order, ckpt_state, state_ss,
                dtype=jnp.int32 if use_i32 else jnp.int64)
        else:
            x = reconstruct_predicted(
                res, taps[:, :, :t], shift, order,
                dtype=jnp.int32 if use_i32 else jnp.int64)
        x = x << wasted[..., None].astype(x.dtype)
        if c == 2:
            left, right = undo_decorrelation(x[:, 0], x[:, 1], channel_code)
            x = jnp.stack([left, right], axis=1)
        pcm = jnp.transpose(x, (0, 2, 1)).astype(jnp.int32)
        if verify_crc:
            pos = jnp.arange(rows.shape[1], dtype=jnp.int32)
            body = jnp.where(pos[None, :] >= (lens - 2)[:, None],
                             jnp.uint8(0), rows)
            crc = crc16_over_rows(body, lens - 2)
            idx = jnp.stack([lens - 2, lens - 1], axis=1).astype(jnp.int32)
            stored = jnp.take_along_axis(rows, idx, axis=1)\
                .astype(jnp.uint32)
            crc_ok = jnp.all(crc.astype(jnp.uint32)
                             == ((stored[:, 0] << 8) | stored[:, 1]))
        else:
            crc_ok = jnp.asarray(True)
        return pcm, err, crc_ok

    kwargs = {}
    if sharding is not None:
        kwargs["in_shardings"] = (sharding,) * (17 if state_ss > 0 else 16)
    _DEVICE_FNS[key] = jax.jit(fn, **kwargs)
    return _DEVICE_FNS[key]


def _decode_rows_device(rows: np.ndarray, lens: np.ndarray, n: int, c: int,
                        bps: int, verify_crc: bool, sharding=None,
                        rows_dev=None):
    """TPU decode path: C++ structure walk + device bit-unpack/reconstruct.

    Returns the device PCM array ``[F, n, c]`` (int32, still on device),
    None when unavailable or when the device parser flagged an error
    (caller falls back), and raises ValueError on malformed streams.
    ``rows_dev`` optionally supplies the row bytes already in HBM.
    """
    import jax

    from flacx.native import scan_frames

    # start the rows DMA first: jax transfers are async, so the bytes
    # stream to HBM WHILE the C++ walker runs — on production PCIe hosts
    # this hides the walk entirely, on thin links it hides the walk
    # under the transfer
    if rows_dev is None:
        try:
            rows_dev = jax.device_put(rows, sharding)
        except ValueError:      # sharding incompatible with this batch
            rows_dev = rows

    f = rows.shape[0]
    # Sample-state checkpoints (chunk-parallel LPC reconstruction) need
    # sample values that fit int32; larger depths keep the serial scan.
    # The inline IIR adds ~50% to the walker's serial cost, so it only
    # pays where host cores can absorb it (the walker threads across
    # rows): on thin hosts the pipeline is walker-bound and the serial
    # device scan is nowhere near the bottleneck.
    import os as _os
    state_ss = 0
    if (bps + (1 if c == 2 else 0) <= 31
            and (_os.cpu_count() or 1) >= CHUNK_STATE_MIN_CORES):
        # 256 measured fastest on the headline LPC-12 signal (r5 sweep:
        # 512 -> 1.26 B, 256 -> 1.37 B, 128 -> 1.33 B samples/s): halving
        # the serial scan depth beats the extra checkpoint lanes until
        # walker output doubles again
        state_ss = 256 if n >= 2048 else max(64, n // 8)
        if n <= state_ss:
            state_ss = 0
    scan = scan_frames(rows, np.zeros(f, np.int64), n, c, bps,
                       state_interval=state_ss)
    if scan is None:
        return None

    # Per-frame sample-size overrides (RFC 9639 frame headers; the
    # reference decodes them natively, flac/decoder.py:186-229): the
    # walker already parsed each frame at its own width — a uniform
    # override just rekeys the device program on that width, and a MIXED
    # batch buckets frames by width through the same path (VERDICT r3
    # item 5; no sequential fallback).
    fb = scan.fbps
    if fb.size and not bool((fb == bps).all()):
        uniq = np.unique(fb)
        if uniq.size == 1:
            return _decode_rows_device(rows, lens, n, c, int(uniq[0]),
                                       verify_crc, sharding, rows_dev)
        pcm_all = np.zeros((f, n, c), np.int32)
        for bval in uniq.tolist():
            idx = np.nonzero(fb == bval)[0]
            sub = _decode_rows_device(
                np.ascontiguousarray(rows[idx]), lens[idx], n, c,
                int(bval), verify_crc, None)
            if sub is None:
                return None
            pcm_dev, err, crc_ok = sub
            if bool(err) or not bool(crc_ok):
                return pcm_dev, err, crc_ok
            pcm_all[idx] = np.asarray(pcm_dev)
        import jax.numpy as _jnp
        return pcm_all, _jnp.asarray(False), _jnp.asarray(True)

    # taps-window bucket, chunk-span bucket and the int32-reconstruction
    # eligibility are batch-level statics (tiny host reductions over
    # walker outputs)
    max_order = int(scan.order.max()) if scan.order.size else 0
    t = next(b for b in (4, 8, 12, 16, 32) if b >= max(4, max_order))
    sum_abs = int(np.abs(scan.taps).sum(-1).max()) if scan.taps.size else 0
    eff_max = bps + (1 if c == 2 else 0)
    use_i32 = eff_max + max(sum_abs, 1).bit_length() + 2 <= 31

    # max bit span of any chunk → words-per-window bucket.  The last
    # chunk of channel c is bounded by channel c+1's first checkpoint
    # (or the frame end when c+1 is constant / c is last — off by only
    # that tiny subframe).  An undersized bucket is caught by the
    # kernel's in-scan cursor check (err → fallback), so this estimate
    # affects speed, never correctness.
    span_bits = 64
    if scan.ckpt_pos.shape[-1] > 1:
        span_bits = max(span_bits, int(np.diff(scan.ckpt_pos, axis=-1)
                                       .max()))
    active = scan.kind >= 1
    if active.any():
        ends = np.broadcast_to(scan.end_bits[:, None], (f, c)).copy()
        if c > 1:
            nxt_start = scan.ckpt_pos[:, 1:, 0]
            nxt_const = scan.kind[:, 1:] == 0
            ends[:, :-1] = np.where(nxt_const, ends[:, :-1], nxt_start)
        span_bits = max(span_bits,
                        int((ends - scan.ckpt_pos[..., -1])[active].max()))
    need = span_bits // 32 + 4
    span_words = next((x for x in (8, 12, 16, 24, 32, 48, 64, 96, 128)
                       if x >= need), None)
    if span_words is None:
        return None

    # all-fixed batches (kinds 0/1/2: constant, verbatim, fixed — shift is
    # always 0, taps binomial) reconstruct via parallel cumsums, no scan
    fixed_max = int(max_order) if bool((scan.kind <= 2).all()) else None
    if fixed_max is not None:
        state_ss = 0
    fn = _device_decode_fn(n, c, bps, scan.ckpt_interval, t, span_words,
                           use_i32, verify_crc, sharding, fixed_max,
                           state_ss)
    # returned WITHOUT forcing: the caller defers the err/crc sync by one
    # batch so the next batch's host structure walk overlaps this batch's
    # device compute
    args = [rows_dev, lens.astype(np.int32), scan.channel_code, scan.kind,
            scan.order, scan.shift, scan.wasted, scan.po, scan.width,
            scan.taps, scan.warmup, scan.const_val, scan.ckpt_pos,
            scan.ckpt_param, scan.ckpt_esc, scan.ckpt_inesc]
    if state_ss > 0:
        args.append(scan.ckpt_state)
    return fn(*args)


#: smallest same-block-size frame group worth a device program in the
#: variable-blocking decode path; smaller groups go through the oracle
VAR_MIN_GROUP = 8


def _decode_var_frames(data: bytes, streaminfo: Streaminfo,
                       offsets: np.ndarray, bsizes: np.ndarray,
                       ends_b: np.ndarray, batch_frames: int,
                       verify_crc: bool, sharding=None
                       ) -> np.ndarray | None:
    """Grouped batch decode of a chained set of variable-size frames.

    ``offsets``/``ends_b`` delimit each frame's bytes in ``data`` and
    ``bsizes`` carries each frame's block size (all from
    :func:`_scan_frame_chain`).  Frames are grouped by block size; each
    group runs through the same fused device pipeline as fixed-blocking
    batches (the programs are keyed on block size), with output scattered
    to each frame's sample position (the cumulative block-size sum — the
    chain scan guarantees contiguity).  Small groups and sub-64-sample
    blocks go through the strict oracle frame decoder instead of
    compiling a device program.  Returns int64 PCM ``[sum(bsizes), c]``
    or ``None`` when a frame fails to decode on every path.
    """
    c = streaminfo.channels
    bps = streaminfo.sample_size
    total = int(bsizes.sum())
    starts = np.concatenate([[0], np.cumsum(bsizes)[:-1]]).astype(np.int64)
    arr = np.frombuffer(data, np.uint8)
    out = np.zeros((total, c), np.int64)

    def oracle_frames(idx: np.ndarray) -> bool:
        for i in idx.tolist():
            r = BitReader(data[offsets[i]:ends_b[i]])
            try:
                _, planar = read_frame(r, streaminfo, verify_crc=verify_crc)
            except (FlacFormatError, EOFError, ValueError):
                return False
            pcm = np.array(planar, np.int64).T
            if pcm.shape[0] != bsizes[i]:
                return False
            out[starts[i]: starts[i] + bsizes[i]] = pcm
        return True

    def resolve(entry) -> bool:
        sel, trip, bs = entry
        if trip is not None:
            pcm_dev, err, crc_ok = trip
            if not bool(err) and bool(crc_ok):
                pos = starts[sel, None] + np.arange(bs)[None, :]
                out[pos.ravel()] = np.asarray(pcm_dev).reshape(-1, c)
                return True
        return oracle_frames(sel)

    for bs in np.unique(bsizes).tolist():
        idx = np.nonzero(bsizes == bs)[0]
        if bs < 64 or idx.size < VAR_MIN_GROUP:
            if not oracle_frames(idx):
                return None
            continue
        pending = None
        for lo in range(0, idx.size, batch_frames):
            sel = idx[lo: lo + batch_frames]
            lens = (ends_b[sel] - offsets[sel]).astype(np.int64)
            width = (int(lens.max()) + 255) // 256 * 256
            from flacx.native import scatter_rows
            rows = scatter_rows(arr, offsets[sel], ends_b[sel], width)
            shard = sharding
            if shard is not None and sel.size % shard.mesh.devices.size:
                shard = None
            try:
                trip = _decode_rows_device(rows, lens, bs, c, bps,
                                           verify_crc, shard)
            except ValueError:
                trip = None
            if pending is not None and not resolve(pending):
                return None
            pending = (sel, trip, bs)
        if pending is not None and not resolve(pending):
            return None
    return out


def _decode_variable(data: bytes, streaminfo: Streaminfo, first: int,
                     batch_frames: int, verify_crc: bool,
                     sharding=None) -> np.ndarray | None:
    """Batch decode of a whole variable-blocking / mixed-block-size stream.

    Scans the frame chain, then decodes via :func:`_decode_var_frames`.
    Returns ``None`` when the scan cannot establish an exact frame tiling
    or a frame fails to decode on every path (caller falls back to the
    strict sequential decoder).

    The reference decoder handles these streams one frame at a time
    (flac/decoder.py:100-130); neither its encoder nor flacx's emits
    them, but grammar-complete decode coverage should not cost the batch
    path.
    """
    try:
        offsets, bsizes, ambiguous = _scan_frame_chain(data, first)
    except FlacFormatError:
        return None
    if not offsets.size:
        return None
    if ambiguous:
        # same safety net as the fixed path: heuristically picked
        # boundaries must be CRC-verified even if the caller opted out
        verify_crc = True
    total = int(bsizes.sum())
    if streaminfo.samples and total != streaminfo.samples:
        return None
    ends_b = np.append(offsets[1:], len(data))
    out = _decode_var_frames(data, streaminfo, offsets, bsizes, ends_b,
                             batch_frames, verify_crc, sharding)
    return None if out is None else out.astype(np.int32)


def decode_array(data: bytes, batch_frames: int = 256,
                 verify_crc: bool = True, device: bool = True,
                 sharding=None) -> tuple[Streaminfo, np.ndarray]:
    """Decode a whole FLAC stream to PCM ``[frames, channels]`` int32.

    ``sharding`` (NamedSharding over a ``frames`` mesh) runs the device
    decode data-parallel across chips; batches whose frame count does not
    divide the mesh run unsharded.

    Malformed input of any shape raises :class:`FlacFormatError` — never a
    bare ``EOFError``/assert like the reference (flac/decoder.py:36,126).
    """
    try:
        return _decode_array(data, batch_frames, verify_crc, device,
                             sharding)
    except EOFError:
        raise FlacFormatError("truncated stream") from None


def _decode_array(data: bytes, batch_frames: int,
                  verify_crc: bool, device: bool,
                  sharding) -> tuple[Streaminfo, np.ndarray]:
    streaminfo, first = parse_stream_header(data)
    n = streaminfo.max_block_size
    c = streaminfo.channels
    total = streaminfo.samples

    # tiny blocks (oracle-encoded, see flacx.pipeline) are not worth a
    # device program: the sequential decoder beats the compile time
    if not device or n < 64:
        return streaminfo, _decode_sequential(data, streaminfo)

    # variable blocking (or any mixed-block-size stream): grouped batch
    # decode, strict sequential decoder when it cannot
    if streaminfo.min_block_size != streaminfo.max_block_size:
        pcm = _decode_variable(data, streaminfo, first, batch_frames,
                               verify_crc, sharding)
        if pcm is None:
            return streaminfo, _decode_sequential(data, streaminfo)
        return streaminfo, pcm

    try:
        offsets, ambiguous = _scan_frame_offsets(data, first, block_size=n)
    except FlacFormatError:
        return streaminfo, _decode_sequential(data, streaminfo)
    if ambiguous:
        # a heuristically picked boundary could decode to wrong PCM with
        # verification off; CRC-16 is the documented safety net for the
        # ambiguity resolution, so it cannot be opted out of here
        verify_crc = True

    n_full = total // n
    tail = total - n_full * n
    if len(offsets) != n_full + (1 if tail else 0):
        return streaminfo, _decode_sequential(data, streaminfo)

    out = np.zeros((total, c), np.int64)
    ends = np.append(offsets[1:], len(data))
    arr = np.frombuffer(data, np.uint8)

    # full-size frames via the batch path; any inconsistency (CRC-16
    # mismatch from a displaced boundary, parse error) means the offset
    # scan was fooled, NOT that the stream is bad — fall back to the
    # strict sequential decoder, which re-validates everything
    def host_parse_batch(lo, hi, rows, lens) -> bool:
        """Fallback 2): host full parse + device reconstruction."""
        if verify_crc:
            from flacx.native import crc16_rows
            crcs = crc16_rows(rows, (lens - 2).astype(np.int32))
            stored = ((rows[np.arange(hi - lo), lens - 2].astype(np.uint16)
                       << 8)
                      | rows[np.arange(hi - lo), lens - 1])
            if not np.array_equal(crcs, stored.astype(np.uint16)):
                return False
        try:
            pcm = _decode_rows(rows, n, c, streaminfo.sample_size)
        except ValueError:
            return False
        out[lo * n: hi * n] = pcm.reshape(-1, c)
        return True

    def resolve(entry) -> bool:
        """Force one pending device batch (or run its host fallback)."""
        lo, hi, trip, rows, lens = entry
        if trip is not None:
            pcm_dev, err, crc_ok = trip
            if not bool(err) and bool(crc_ok):
                out[lo * n: hi * n] = np.asarray(pcm_dev).reshape(-1, c)
                return True
        return host_parse_batch(lo, hi, rows, lens)

    pending = None
    for lo in range(0, n_full, batch_frames):
        hi = min(lo + batch_frames, n_full)
        batch_off = offsets[lo:hi]
        batch_end = ends[lo:hi]
        lens = (batch_end - batch_off).astype(np.int64)
        # row width bucketed to limit jit variants across batches
        width = (int(lens.max()) + 255) // 256 * 256
        from flacx.native import scatter_rows
        rows = scatter_rows(arr, batch_off, batch_end, width)

        # 1) full device path: C++ structure walk + on-device bit-unpack,
        #    reconstruction and CRC-16, dispatched ASYNC — the previous
        #    batch resolves while this one computes on device
        shard = sharding
        if shard is not None and (hi - lo) % shard.mesh.devices.size:
            shard = None
        try:
            trip = _decode_rows_device(rows, lens, n, c,
                                       streaminfo.sample_size, verify_crc,
                                       shard)
        except ValueError:
            return streaminfo, _decode_sequential(data, streaminfo)
        if pending is not None and not resolve(pending):
            return streaminfo, _decode_sequential(data, streaminfo)
        pending = (lo, hi, trip, rows, lens)
    if pending is not None and not resolve(pending):
        return streaminfo, _decode_sequential(data, streaminfo)

    # short final frame via the oracle
    if tail:
        r = BitReader(data)
        r.read_bytes(int(offsets[-1]))
        _, planar = read_frame(r, streaminfo, verify_crc=verify_crc)
        out[n_full * n:] = np.array(planar, np.int64).T

    return streaminfo, out.astype(np.int32)


def _decode_rows(rows: np.ndarray, n: int, c: int, bps: int) -> np.ndarray:
    """Parse + reconstruct one batch of equal-size frames → [F, N, C]."""
    import jax.numpy as jnp

    from flacx.hostdec import parse_frames
    from flacx.ops.reconstruct import reconstruct_predicted, undo_decorrelation

    f = rows.shape[0]
    parsed = parse_frames(rows, np.zeros(f, np.int64), n, c, bps)

    res = jnp.asarray(parsed.residual)
    taps = jnp.asarray(parsed.taps.astype(np.int32))
    shift = jnp.asarray(parsed.shift.astype(np.int32))
    order = jnp.asarray(parsed.order.astype(np.int32))
    x = reconstruct_predicted(res, taps, shift, order)
    x = x << jnp.asarray(parsed.wasted)[..., None].astype(x.dtype)

    if c == 2:
        left, right = undo_decorrelation(
            x[:, 0], x[:, 1], jnp.asarray(parsed.channel_code
                                          .astype(np.int32)))
        x = jnp.stack([left, right], axis=1)
    return np.asarray(x).transpose(0, 2, 1)


def _decode_sequential(data: bytes, streaminfo: Streaminfo) -> np.ndarray:
    """Oracle fallback: strict sequential decode."""
    r = BitReader(data)
    r.read_bytes(4)
    while True:
        header = read_metadata_header(r)
        if header.type == MetadataBlockType.Streaminfo:
            read_streaminfo(r)
        else:
            r.read_bytes(header.length)
        if header.last:
            break
    chunks = []
    while not r.at_eof():
        _, planar = read_frame(r, streaminfo)
        chunks.append(np.array(planar, np.int64).T)
    return np.concatenate(chunks, axis=0).astype(np.int32)

class _RowBatchDecoder:
    """Decode ``[F, width]`` byte-row batches of full-size frames to PCM.

    Wraps the two batched paths of :func:`decode_array` — the fused device
    program and the host lockstep parse — behind submit/resolve so the
    streaming decoder can keep one batch in flight.  ``try_resolve``
    returns ``None`` when both paths reject the batch (a fooled boundary
    scan, not necessarily a bad stream): the caller re-decodes that byte
    range sequentially.
    """

    def __init__(self, streaminfo: Streaminfo, verify_crc: bool,
                 sharding=None):
        self.si = streaminfo
        self.verify_crc = verify_crc
        self.sharding = sharding

    def submit(self, rows: np.ndarray, lens: np.ndarray):
        """Dispatch the device decode asynchronously; returns an entry."""
        n, c = self.si.max_block_size, self.si.channels
        shard = self.sharding
        if shard is not None and rows.shape[0] % shard.mesh.devices.size:
            shard = None
        try:
            trip = _decode_rows_device(rows, lens, n, c,
                                       self.si.sample_size, self.verify_crc,
                                       shard)
        except ValueError:
            trip = None
        return (trip, rows, lens)

    def try_resolve(self, entry) -> np.ndarray | None:
        """Force one entry → int32 PCM ``[F·n, channels]`` (or ``None``)."""
        trip, rows, lens = entry
        n, c = self.si.max_block_size, self.si.channels
        if trip is not None:
            pcm_dev, err, crc_ok = trip
            if not bool(err) and bool(crc_ok):
                return np.asarray(pcm_dev).reshape(-1, c).astype(np.int32)
        if self.verify_crc:
            from flacx.native import crc16_rows
            f = rows.shape[0]
            crcs = crc16_rows(rows, (lens - 2).astype(np.int32))
            stored = ((rows[np.arange(f), lens - 2].astype(np.uint16) << 8)
                      | rows[np.arange(f), lens - 1])
            if not np.array_equal(crcs, stored.astype(np.uint16)):
                return None
        try:
            pcm = _decode_rows(rows, n, c, self.si.sample_size)
        except ValueError:
            return None
        return pcm.reshape(-1, c).astype(np.int32)


def decode_stream(f, batch_frames: int = 256, verify_crc: bool = True,
                  device: bool = True, sharding=None,
                  readahead: int = 4 << 20):
    """Constant-memory streaming decode of a FLAC byte stream.

    Returns ``(streaminfo, chunks)`` where ``chunks`` is a generator of
    int32 ``[n_i, channels]`` PCM arrays in stream order.  Peak memory is
    O(``readahead`` + one decoded window) regardless of file length — the
    reference's incremental generator contract (flac/decoder.py:46-55,
    one frame at a time) at device-batch granularity.

    Each buffered window is boundary-scanned and batch-decoded on device;
    windows the scan or batch paths reject (scan ambiguity, displaced
    boundaries) are re-decoded sequentially by the strict oracle — always
    strict, never wrong.  ``f`` only needs ``read()``; the stream may be
    unseekable (a pipe).
    """
    head = b""
    while True:
        piece = f.read(1 << 16)
        if piece:
            head += piece
        try:
            streaminfo, first = parse_stream_header(head)
            break
        except EOFError:
            if not piece:
                raise FlacFormatError("truncated stream header") from None
    n = streaminfo.max_block_size
    c = streaminfo.channels
    fixed_blocking = streaminfo.min_block_size == streaminfo.max_block_size
    bdec = (_RowBatchDecoder(streaminfo, verify_crc, sharding)
            if device and fixed_blocking else None)
    # windows whose boundary scan resolved duplicates heuristically must
    # verify CRC-16 even when the caller opted out (the safety net for
    # the ambiguity resolution)
    bdec_strict = (_RowBatchDecoder(streaminfo, True, sharding)
                   if bdec is not None and not verify_crc else bdec)

    def sequential_window(buf: bytes, eof: bool):
        """Strict frame-by-frame decode of a window prefix.

        Returns ``(pcm_chunks, consumed_bytes)``; stops at the first
        frame that runs past the window (needs a refill).
        """
        r = BitReader(buf)
        outs, pos = [], 0
        while pos < len(buf):
            try:
                _, planar = read_frame(r, streaminfo,
                                       verify_crc=verify_crc)
            except EOFError:
                if eof:
                    raise FlacFormatError(
                        "truncated stream (incomplete final frame)"
                    ) from None
                break
            pos = r.bit_position // 8
            outs.append(np.array(planar, np.int64).T)
        return outs, pos

    def drain_tail(window: bytes, pos: int):
        """Strictly decode every frame from ``pos`` to the stream end.

        Normally one (possibly short) final frame, but a mid-window chain
        break can leave several frames past the last scanned offset.
        """
        tr = BitReader(window[pos:])
        while not tr.at_eof():
            try:
                _, planar = read_frame(tr, streaminfo,
                                       verify_crc=verify_crc)
            except EOFError:
                raise FlacFormatError(
                    "truncated stream (incomplete final frame)") from None
            yield np.array(planar, np.int64).T.astype(np.int32)

    def gen():
        buf = bytearray(head[first:])
        eof = False
        target = readahead
        while True:
            while not eof and len(buf) < target:
                piece = f.read(max(target - len(buf), 1 << 16))
                if not piece:
                    eof = True
                    break
                buf += piece
            if not buf:
                return
            window = bytes(buf)

            # variable-blocking windows: grouped batch decode of every
            # boundary-delimited frame (the same device pipeline as
            # decode_array's _decode_variable), sequential fallback below
            if device and not fixed_blocking:
                try:
                    voffs, vbs, vamb = _scan_frame_chain(window, 0)
                except FlacFormatError:
                    voffs = np.asarray([], np.int64)
                # the window starts at a known frame boundary; a scan
                # that does not see it cannot be trusted
                if voffs.size > 1 and int(voffs[0]) == 0:
                    pcm = _decode_var_frames(
                        window, streaminfo, voffs[:-1], vbs[:-1],
                        voffs[1:], batch_frames, verify_crc or vamb,
                        sharding)
                    if pcm is not None:
                        yield pcm.astype(np.int32)
                        if eof:
                            yield from drain_tail(window, int(voffs[-1]))
                            return
                        del buf[: int(voffs[-1])]
                        target = readahead
                        continue

            offsets = np.asarray([], np.int64)
            wdec = bdec
            if bdec is not None:
                try:
                    offsets, ambiguous = _scan_frame_offsets(
                        window, 0, block_size=n)
                    if ambiguous:
                        wdec = bdec_strict
                except FlacFormatError:
                    pass
            # the window starts at a known frame boundary; a scan that
            # does not see it cannot be trusted
            batched = offsets.size > 0 and int(offsets[0]) == 0

            if batched:
                # full frames = all boundary-delimited ones; at EOF the
                # final (possibly short) frame goes through the oracle
                full = offsets[:-1]
                ends = offsets[1:]
                arr = np.frombuffer(window, np.uint8)
                results: list[np.ndarray] = []
                pending = None
                failed = False
                for lo in range(0, len(full), batch_frames):
                    hi = min(lo + batch_frames, len(full))
                    lens = (ends[lo:hi] - full[lo:hi]).astype(np.int64)
                    width = (int(lens.max()) + 255) // 256 * 256
                    from flacx.native import scatter_rows
                    rows = scatter_rows(arr, full[lo:hi], ends[lo:hi],
                                        width)
                    entry = wdec.submit(rows, lens)
                    if pending is not None:
                        pcm = wdec.try_resolve(pending)
                        if pcm is None:
                            failed = True
                            break
                        results.append(pcm)
                    pending = entry
                if not failed and pending is not None:
                    pcm = wdec.try_resolve(pending)
                    if pcm is None:
                        failed = True
                    else:
                        results.append(pcm)
                if not failed:
                    yield from results
                    if eof:
                        yield from drain_tail(window, int(offsets[-1]))
                        return
                    consumed = int(offsets[-1])
                    if consumed == 0:
                        target *= 2           # one frame wider than window
                        continue
                    del buf[:consumed]
                    target = readahead
                    continue

            # strict sequential window decode (scan rejected / displaced
            # boundaries / host-path mismatch / non-batchable stream)
            outs, pos = sequential_window(window, eof)
            if pos == 0:
                target *= 2                   # one frame wider than window
                continue
            if outs:
                yield np.concatenate(outs, axis=0).astype(np.int32)
            del buf[:pos]
            target = readahead
            if eof and not buf:
                return

    def safe_gen():
        # clean-error contract: malformed windows surface as
        # FlacFormatError, never a bare EOFError from a bit reader
        try:
            yield from gen()
        except EOFError:
            raise FlacFormatError("truncated stream") from None

    return streaminfo, safe_gen()
