"""flacx headline benchmark.

Measures the device encode pipeline's steady-state throughput on one chip
(16-bit/44.1 kHz stereo, LPC order 12, block 4608, subset defaults — the
BASELINE.json headline config), validates a bit-exact round-trip of one
batch through the strict oracle decoder, and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is against the measured reference encoder throughput of
38.6k samples/s (BASELINE.md: 176,400 samples in 4.567 s, single CPU core).

Methodology notes: dispatches are queued with distinct inputs and a small
device-side reduction is fetched per batch, so the figure reflects the
pipeline (PCM in HBM → complete CRC'd FLAC frames in HBM).  The dev-tunnel
host link (~30 MB/s) is not representative of production host I/O and is
excluded; correctness of the exact bytes is asserted separately.
"""

import io
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np  # noqa: E402

REFERENCE_SAMPLES_PER_SEC = 38_600.0


def synth_pcm(rng: np.random.Generator, frames: int) -> np.ndarray:
    t = np.arange(frames, dtype=np.float64)
    left = (0.6 * np.sin(2 * np.pi * 220.0 / 44100.0 * t)
            + 0.25 * np.sin(2 * np.pi * 587.3 / 44100.0 * t + 0.3)
            + 0.02 * rng.standard_normal(frames))
    right = (0.55 * np.sin(2 * np.pi * 329.6 / 44100.0 * t + 0.1)
             + 0.2 * np.sin(2 * np.pi * 880.0 / 44100.0 * t)
             + 0.02 * rng.standard_normal(frames))
    pcm = np.stack([left, right], axis=1)
    return np.clip(pcm * 22000, -32768, 32767).astype(np.int32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.oracle import decode_stream
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    rng = np.random.default_rng(0xF1AC)
    n, b = 4608, 1024
    cfg = EncoderConfig(block_size=n, max_lpc_order=12)
    enc = BatchEncoder(cfg, batch_frames=b)

    pcm = synth_pcm(rng, n * b)
    planar = jnp.asarray(
        pcm.reshape(b, n, 2).transpose(0, 2, 1).astype(np.int32))

    # -- correctness gate: bit-exact round-trip.  The whole batch decodes
    # through the batched decoder (native parse + device reconstruction,
    # CRC-16 verified); a 16-frame sample additionally decodes through the
    # independent pure-Python strict oracle.
    from flacx.decoder import decode_array
    result = enc.encode_batch_device(np.asarray(planar), 0)
    lens = np.asarray(result["length"])
    data = np.asarray(result["bytes"])

    def make_stream(k, rows=None, rlens=None):
        rows = data if rows is None else rows
        rlens = lens if rlens is None else rlens
        return (MAGIC
                + serialize_metadata_header(True,
                                            MetadataBlockType.Streaminfo, 34)
                + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                  n * k, bytes(16)))
                + b"".join(rows[i, : rlens[i]].tobytes() for i in range(k)))

    stream = make_stream(b)
    _, got = decode_array(stream, batch_frames=256)
    assert np.array_equal(got, pcm), "round-trip mismatch — refusing to bench"
    *_, rows = decode_stream(io.BytesIO(make_stream(16)))
    got16 = np.array([r for r in rows], dtype=np.int64)
    assert np.array_equal(got16, pcm[: 16 * n]), "oracle round-trip mismatch"
    ratio = len(stream) / pcm.nbytes * 2  # int32 holds 16-bit samples

    # -- device decode throughput (rows in HBM → verified PCM in HBM).
    # Two tracked signals (VERDICT r3 item 3):
    #   decode_device_fixed — an all-fixed-predictor stream (the r2-class
    #     shape: reconstruction = parallel nested cumsums, no serial scan);
    #   decode_device_mixed — the headline LPC-12 stream, decoded with the
    #     walker's sample-state checkpoints (chunk-parallel LPC
    #     reconstruction, the production multi-core-host program).
    from flacx.decoder import (_device_decode_fn, parse_stream_header,
                               scan_frame_offsets)
    from flacx.native import scan_frames, scatter_rows

    # -- chip-calibration probe (VERDICT r4 item 6): two pinned kernels
    # with no flacx code — an MXU matmul chain and an HBM-bound
    # elementwise pass — timed by the same slope method, so BENCH_rN →
    # BENCH_rN+1 deltas can be read net of the shared chip's documented
    # ~2.3× session-to-session variance (README).
    def chip_probe() -> dict:
        a = jnp.asarray(np.random.default_rng(7)
                        .standard_normal((2048, 2048)), jnp.float32)
        # larger than VMEM so the elementwise probe is HBM-bound
        big = jnp.arange(64 * 1024 * 1024, dtype=jnp.int32)  # 256 MB

        # every probe folds to ONE scalar fetched per run —
        # block_until_ready is not a reliable barrier on this backend
        # (see .claude/skills/verify)
        def mm(iters):
            def f(x):
                def body(i, acc):
                    return acc @ a * jnp.float32(1e-3)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
            return jax.jit(f)

        def hbm(iters):
            def f(x):
                def body(i, acc):
                    return acc + (acc >> 7) + i
                return jnp.sum(jax.lax.fori_loop(0, iters, body, x),
                               dtype=jnp.int64)
            return jax.jit(f)

        out = {}
        # wide iteration spreads: the slope must dwarf the ±ms dispatch
        # jitter of the dev tunnel (a 20-iteration spread measured
        # negative in the first capture)
        for name, mk, lo, hi in (("matmul", mm, 16, 272),
                                 ("hbm", hbm, 8, 104)):
            fs, fb = mk(lo), mk(hi)
            x0 = a if name == "matmul" else big
            float(fs(x0))
            float(fb(x0))
            # min of EACH endpoint, then subtract: per-pair differences
            # go negative when the fixed dispatch cost's jitter exceeds
            # the slope (observed on the matmul probe's first capture)
            ts_best = tb_best = None
            for _ in range(3):
                t0 = time.time()
                float(fs(x0))
                ts = time.time() - t0
                t0 = time.time()
                float(fb(x0))
                tb = time.time() - t0
                ts_best = ts if ts_best is None else min(ts_best, ts)
                tb_best = tb if tb_best is None else min(tb_best, tb)
            dt_p = (tb_best - ts_best) / (hi - lo)
            out[f"chip_probe_{name}_ms"] = round(dt_p * 1e3, 4)
        return out

    probe = chip_probe()

    def stage_rows(data: bytes, block: int, frames: int, ch: int = 2):
        _, first_ = parse_stream_header(data)
        offsets = scan_frame_offsets(data, first_, block_size=block)
        assert len(offsets) == frames
        arr_ = np.frombuffer(data, np.uint8)
        ends_ = np.append(offsets[1:], len(data))
        dlens = (ends_ - offsets).astype(np.int64)
        width = (int(dlens.max()) + 255) // 256 * 256
        return scatter_rows(arr_, offsets, ends_, width), dlens

    def time_device_decode(data: bytes, state_ss: int = 0,
                           block: int | None = None, frames: int | None
                           = None, ch: int = 2, bps: int = 16) -> float:
        """Samples/s of the fused rows→PCM program (slope method)."""
        nn = n if block is None else block
        bb = b if frames is None else frames
        rows8, dlens = stage_rows(data, nn, bb, ch)
        scan = scan_frames(rows8, np.zeros(bb, np.int64), nn, ch, bps,
                           state_interval=state_ss)
        t_bucket = next(x for x in (4, 8, 12, 16, 32)
                        if x >= max(4, int(scan.order.max())))
        use_i32 = (bps + 1 + max(int(np.abs(scan.taps).sum(-1).max()),
                                 1).bit_length() + 2 <= 31)
        span = 64 + int(np.diff(scan.ckpt_pos, axis=-1).max())
        sw = next(x for x in (8, 12, 16, 24, 32, 48, 64, 96, 128)
                  if x >= span // 32 + 4)
        fixed_max = (int(scan.order.max())
                     if bool((scan.kind <= 2).all()) else None)
        eff_ss = 0 if fixed_max is not None else state_ss
        dfn = _device_decode_fn(nn, ch, bps, scan.ckpt_interval, t_bucket,
                                sw, use_i32, True, fixed_max=fixed_max,
                                state_ss=eff_ss)
        host_args = [rows8, dlens.astype(np.int32), scan.channel_code,
                     scan.kind, scan.order, scan.shift, scan.wasted,
                     scan.po, scan.width, scan.taps, scan.warmup,
                     scan.const_val, scan.ckpt_pos, scan.ckpt_param,
                     scan.ckpt_esc, scan.ckpt_inesc]
        if eff_ss > 0:
            host_args.append(scan.ckpt_state)
        dargs = jax.device_put(tuple(host_args))
        out = dfn(*dargs)
        jax.block_until_ready(out)                   # compile + warm
        pcm_dev, derr, dcrc = out
        assert not bool(derr) and bool(dcrc), "device decode error/CRC fail"

        # Same slope methodology as encode below: K decode batches per
        # dispatch via lax.fori_loop.  A runtime-zero, accumulator-
        # dependent perturbation of `wasted` keeps the decoded PCM
        # identical while defeating loop-invariant code motion; the PCM
        # checksum keeps every batch live.
        def dec_many(iters):
            def f(*args):
                wasted = args[6]

                def body(i, acc):
                    z = jnp.where(acc == jnp.int64(-1),
                                  1, 0).astype(wasted.dtype)
                    p, e, ok = dfn(*args[:6], wasted + z, *args[7:])
                    # consume the CRC verdict too — otherwise XLA dead-
                    # code-eliminates the device CRC-16 verification
                    return (acc + jnp.sum(p, dtype=jnp.int64)
                            + e.astype(jnp.int64) + ok.astype(jnp.int64))

                return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

            return jax.jit(f)

        d_small, d_big = dec_many(2), dec_many(10)
        int(d_small(*dargs))                         # warm
        int(d_big(*dargs))
        dt_d = None
        for _ in range(2):
            t0 = time.time()
            int(d_small(*dargs))
            td_small = time.time() - t0
            t0 = time.time()
            int(d_big(*dargs))
            td_big = time.time() - t0
            d = (td_big - td_small) / 8
            dt_d = d if dt_d is None else min(dt_d, d)
        return nn * bb * ch / dt_d

    dec_sps = time_device_decode(stream, state_ss=256)

    # the pinned all-fixed signal: same PCM, LPC disabled at encode
    cfg_f = EncoderConfig(block_size=n, max_lpc_order=0)
    enc_f = BatchEncoder(cfg_f, batch_frames=b)
    res_f = enc_f.encode_batch_device(np.asarray(planar), 0)
    lens_f = np.asarray(res_f["length"])
    data_f = np.asarray(res_f["bytes"])
    stream_f = make_stream(b, data_f, lens_f)
    dec_fixed_sps = time_device_decode(stream_f)

    # -- END-TO-END decode: file bytes on host → CRC-verified PCM in HBM,
    # wall-clock, including the vectorized boundary scan, the C++
    # structure walker and all host row assembly (VERDICT round-2 #2).
    # PCM stays in HBM and the err/CRC verdicts are folded to ONE device
    # scalar fetched once, consistent with the encode methodology (the
    # ~30 MB/s dev-tunnel DMA is not production host I/O).  A 4× longer
    # stream amortizes the tunnel's fixed per-fetch latency.
    from flacx.decoder import _decode_rows_device, _scan_frame_offsets

    streams4 = [make_stream(b)]
    for rep in range(3):
        res_r = enc.encode_batch_device(
            np.asarray(planar) + (rep % 3) - 1, (rep + 1) * b)
        lens_r = np.asarray(res_r["length"])
        data_r = np.asarray(res_r["bytes"])
        streams4.append(b"".join(data_r[i, : lens_r[i]].tobytes()
                                 for i in range(b)))
    long_stream = streams4[0] + b"".join(streams4[1:])
    n_frames = 4 * b

    def e2e_decode(data: bytes, staged=None) -> float:
        """File bytes → verified PCM in HBM.  ``staged`` (rows already in
        HBM, host mirrors in RAM) measures the ex-ingress variant: the
        13 MB/batch row DMA rides the dev tunnel (~70 MB/s), which is not
        production host I/O — the encode methodology excludes the same
        link, so both numbers are reported."""
        t0 = time.time()
        _, first_ = parse_stream_header(data)
        offs, _ = _scan_frame_offsets(data, first_, block_size=n)
        assert len(offs) == n_frames
        arr_ = np.frombuffer(data, np.uint8)
        ends_ = np.append(offs[1:], len(data))
        bad = None
        for k, lo in enumerate(range(0, n_frames, 1024)):
            hi = lo + 1024
            lens_ = (ends_[lo:hi] - offs[lo:hi]).astype(np.int64)
            w = (int(lens_.max()) + 255) // 256 * 256
            rws = scatter_rows(arr_, offs[lo:hi], ends_[lo:hi], w)
            dev = staged[k] if staged is not None else None
            _, err_, crc_ = _decode_rows_device(rws, lens_, n, 2, 16, True,
                                                rows_dev=dev)
            flag = err_ | ~crc_
            bad = flag if bad is None else (bad | flag)
        assert not bool(bad)            # the single scalar sync
        return time.time() - t0

    e2e_decode(long_stream)             # warm (compile + caches)
    te2e = min(e2e_decode(long_stream) for _ in range(3))
    e2e_sps = n * n_frames * 2 / te2e

    # pre-stage every batch's rows in HBM for the ex-ingress number
    arr_l = np.frombuffer(long_stream, np.uint8)
    _, first_l = parse_stream_header(long_stream)
    offs_l, _ = _scan_frame_offsets(long_stream, first_l, block_size=n)
    ends_l = np.append(offs_l[1:], len(long_stream))
    staged = []
    for lo in range(0, n_frames, 1024):
        hi = lo + 1024
        lens_l = (ends_l[lo:hi] - offs_l[lo:hi]).astype(np.int64)
        w = (int(lens_l.max()) + 255) // 256 * 256
        rws = scatter_rows(arr_l, offs_l[lo:hi], ends_l[lo:hi], w)
        staged.append(jax.device_put(rws))
    jax.block_until_ready(staged)
    te2e_x = min(e2e_decode(long_stream, staged) for _ in range(3))
    e2e_x_sps = n * n_frames * 2 / te2e_x

    # -- steady-state throughput: K full encode batches per dispatch via
    # lax.fori_loop (each iteration perturbs the PCM and advances the
    # frame indices; a checksum reduction keeps every batch live).  The
    # slope between two K values isolates per-batch device time — the
    # dev-tunnel host link (~10 ms/dispatch here, absent on production
    # hosts) is excluded per the methodology note above.
    # The checksum MUST consume the byte array, not just the lengths:
    # total_bits is derived from the symbol-length sums, so a
    # lengths-only reduction would let XLA dead-code-eliminate the
    # entire word merge + byte assembly + CRC-16 tail of the pipeline
    # and overstate throughput.
    def many(iters):
        def fn(p, base):
            def body(i, acc):
                out = enc._fn(p + (i % 3).astype(jnp.int32),
                              base + i.astype(jnp.int64))
                return (acc + jnp.sum(out["length"])
                        + jnp.sum(out["bytes"].astype(jnp.uint32))
                        .astype(jnp.int64))
            return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
        return jax.jit(fn)

    # -- roofline context (VERDICT round-2 #7).  Two bytes models:
    # (a) XLA's post-fusion per-op "bytes accessed" for the compiled encode
    #     program — an UPPER bound on HBM traffic (operands read by several
    #     ops are counted once per op, and VMEM-resident buffers still
    #     count), so the derived rate can exceed physical peak;
    # (b) the speed-of-light floor: PCM in at the TRUE sample width
    #     (bps/8 bytes per sample — the problem's own data, not the int32
    #     staging layout; ADVICE r3) + packed frame bytes out.
    #     sol_time_x = measured time / SOL time tells rounds 5+ how far
    #     the pipeline is from pure-data-movement; xla_traffic_ratio =
    #     (a)/(b) tells how much intermediate traffic the program still
    #     requests.
    HBM_PEAK_BYTES_PER_S = 819e9                      # TPU v5e
    try:
        ca = (enc._fn.lower(planar, jnp.int64(0)).compile()
              .cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        hbm_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        hbm_bytes = 0.0
    sol_bytes = float(planar.size * cfg.bps // 8 + int(lens.sum()))

    f_small, f_big = many(2), many(10)
    int(f_small(planar, jnp.int64(10)))      # warm
    int(f_big(planar, jnp.int64(20)))
    # best-of-3 slope: single pairs vary ±0.5 ms/batch on the dev tunnel
    dt = None
    for rep in range(3):
        t0 = time.time()
        int(f_small(planar, jnp.int64(100 + rep)))
        t_small = time.time() - t0
        t0 = time.time()
        int(f_big(planar, jnp.int64(200 + rep)))
        t_big = time.time() - t0
        d = (t_big - t_small) / 8
        dt = d if dt is None else min(dt, d)
    samples_per_sec = b * n * 2 / dt

    # -- END-TO-END encode (VERDICT r3 item 7, symmetric with decode's):
    # interleaved PCM in host RAM → complete FLAC file bytes in host RAM
    # through pipeline.encode_chunks_to_file (ingest, upload, device
    # pipeline, frame fetch, host assembly, MD5, Streaminfo backpatch).
    # The ex-ingress variant pre-stages the planar batches in HBM —
    # excluding the host→device PCM DMA, which rides the ~70 MB/s dev
    # tunnel here (production PCIe is ~100× that; decode's ex-ingress
    # number excludes the same link).
    from flacx.pipeline import encode_chunks_to_file

    pcm4 = np.concatenate([pcm + k - 1 for k in range(3)] + [pcm])
    n_frames_e = 4 * b

    def e2e_encode() -> float:
        sink = io.BytesIO()
        t0 = time.time()
        encode_chunks_to_file(
            sink, (pcm4[s: s + n * b] for s in range(0, n * b * 4, n * b)),
            sample_rate=44100, bps=16, channels=2, block_size=n,
            max_lpc_order=12, qlp_precision=5,
            partition_orders=(0, 1, 2, 3, 4, 5), total_samples=n * b * 4,
            batch_frames=b)
        return time.time() - t0

    e2e_encode()                        # warm (compile + caches)
    te2e_enc = min(e2e_encode() for _ in range(2))
    enc_e2e_sps = n * n_frames_e * 2 / te2e_enc

    planar4 = [jax.device_put(np.ascontiguousarray(
        pcm4[s: s + n * b].reshape(b, n, 2).transpose(0, 2, 1)))
        for s in range(0, n * b * 4, n * b)]
    jax.block_until_ready(planar4)

    def e2e_encode_exingress() -> float:
        t0 = time.time()
        total = 0
        for frame in enc.encode_frame_stream(iter(planar4), 0):
            total += len(frame)
        assert total > 0
        return time.time() - t0

    e2e_encode_exingress()              # warm
    te2e_enc_x = min(e2e_encode_exingress() for _ in range(2))
    enc_e2e_x_sps = n * n_frames_e * 2 / te2e_enc_x

    # -- hi-res tracked entry (VERDICT round-2 #8, BASELINE configs[2]):
    # 24-bit/96 kHz stereo, LPC order ≤ 32, block 16384, the FULL
    # partition range 0..15 (0..14 legal at 16384) — exercises the i64
    # MAC, escape and k-chunked-search paths under steady state.
    nh, bh = 16384, 128
    cfg_h = EncoderConfig(block_size=nh, max_lpc_order=32, bps=24,
                          sample_rate=96000,
                          partition_orders=tuple(range(16)))
    enc_h = BatchEncoder(cfg_h, batch_frames=bh)
    pcm_h = np.clip(synth_pcm(rng, nh * bh).astype(np.float64)
                    * (1 << 8), -(1 << 23), (1 << 23) - 1).astype(np.int32)
    planar_h = jnp.asarray(
        pcm_h.reshape(bh, nh, 2).transpose(0, 2, 1).astype(np.int32))
    res_h = enc_h.encode_batch_device(np.asarray(planar_h), 0)
    lens_h = np.asarray(res_h["length"])
    data_h = np.asarray(res_h["bytes"])
    stream_h = (MAGIC
                + serialize_metadata_header(True,
                                            MetadataBlockType.Streaminfo, 34)
                + serialize_streaminfo(Streaminfo(nh, nh, 0, 0, 96000, 2,
                                                  24, nh * bh, bytes(16)))
                + b"".join(data_h[i, : lens_h[i]].tobytes()
                           for i in range(bh)))
    _, got_h = decode_array(stream_h, batch_frames=bh)
    assert np.array_equal(got_h, pcm_h), "hi-res round-trip mismatch"

    def many_h(iters):
        def fn(p, base):
            def body(i, acc):
                out = enc_h._fn(p + (i % 3).astype(jnp.int32),
                                base + i.astype(jnp.int64))
                return (acc + jnp.sum(out["length"])
                        + jnp.sum(out["bytes"].astype(jnp.uint32))
                        .astype(jnp.int64))
            return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
        return jax.jit(fn)

    # hi-res DECODE (VERDICT r4 item 3): block 16384 / order ≤32 / 24-bit
    # through the same chunk-parallel device decode program
    hires_dec_sps = time_device_decode(stream_h, state_ss=256, block=nh,
                                       frames=bh, ch=2, bps=24)

    fh_small, fh_big = many_h(2), many_h(6)
    int(fh_small(planar_h, jnp.int64(10)))   # warm
    int(fh_big(planar_h, jnp.int64(20)))
    dth = None
    for rep in range(3):
        t0 = time.time()
        int(fh_small(planar_h, jnp.int64(100 + rep)))
        th_small = time.time() - t0
        t0 = time.time()
        int(fh_big(planar_h, jnp.int64(200 + rep)))
        th_big = time.time() - t0
        dh = (th_big - th_small) / 4
        dth = dh if dth is None else min(dth, dh)
    hires_sps = bh * nh * 2 / dth
    ratio_h = len(stream_h) / (pcm_h.size * 3)

    print(json.dumps({
        "metric": ("Encoded PCM samples/sec/chip "
                   "(16-bit stereo, LPC-12, bit-exact round-trip)"),
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 1),
        "detail": {
            "ms_per_batch": round(dt * 1e3, 2),
            "batch_frames": b,
            "block_size": n,
            "realtime_x": round(samples_per_sec / 88200.0, 1),
            "compression_ratio": round(ratio, 4),
            # decode_device_mixed: the headline LPC-12 stream through the
            # chunk-parallel-reconstruction program (sample-state
            # checkpoints, the multi-core-host production config);
            # decode_device_fixed: the pinned all-fixed stream (r2-class
            # shape, parallel-cumsum reconstruction) — VERDICT r3 item 3
            "decode_device_samples_per_s": round(dec_sps, 1),
            "decode_device_mixed": round(dec_sps, 1),
            "decode_device_fixed": round(dec_fixed_sps, 1),
            "decode_vs_reference": round(dec_sps / 143_000.0, 1),
            "decode_e2e_samples_per_s": round(e2e_sps, 1),
            "decode_e2e_ms": round(te2e * 1e3, 2),
            "decode_e2e_exingress_samples_per_s": round(e2e_x_sps, 1),
            "encode_e2e_samples_per_s": round(enc_e2e_sps, 1),
            "encode_e2e_exingress_samples_per_s": round(enc_e2e_x_sps, 1),
            "hbm_bytes_per_batch": round(hbm_bytes, 0),
            "sol_hbm_bytes_per_batch": round(sol_bytes, 0),
            # measured time as a multiple of the speed-of-light
            # data-movement time (true-width PCM in + frames out at HBM
            # peak).  NOTE r4: the SOL floor moved from the int32 staging
            # width to the true sample width (ADVICE r3), which LOWERS the
            # floor ~45% — sol_time_x is not comparable to BENCH_r03's
            # 44.6 under the old floor (old-floor equivalent ≈ this × 0.57).
            # The redundant roofline_pct (= 100/sol_time_x) was dropped.
            "sol_time_x": round(dt / (sol_bytes / HBM_PEAK_BYTES_PER_S), 1),
            # XLA-requested traffic per SOL byte (upper bound; per-op
            # double counting means the implied rate can exceed peak)
            "xla_traffic_ratio": round(hbm_bytes / sol_bytes, 1)
            if hbm_bytes else None,
            **probe,
            "hires": {
                "config": "24-bit/96kHz stereo, LPC<=32, block 16384, "
                          "partition orders 0..15 (0..14 legal), "
                          "bit-exact round-trip",
                "encode_samples_per_s": round(hires_sps, 1),
                "ms_per_batch": round(dth * 1e3, 2),
                "realtime_x": round(hires_sps / (2 * 96_000.0), 1),
                "compression_ratio": round(ratio_h, 4),
                "decode_device_samples_per_s": round(hires_dec_sps, 1),
            },
        },
    }))


if __name__ == "__main__":
    main()
