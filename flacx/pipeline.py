"""End-to-end encode orchestration: device pipeline + host assembly.

Full blocks stream through the jitted ``BatchEncoder``; the (at most one)
short final block goes through the oracle — the sequential tail isn't worth
a device dispatch shape.  The stream writer computes MD5 and patches
Streaminfo on finalize.
"""

from __future__ import annotations

from typing import BinaryIO

import numpy as np

from flacx.format import INDEPENDENT_CHANNELS
from flacx.stream import StreamWriter


def _oracle_frame(pcm_rows: np.ndarray, index: int, bps: int,
                  block_size: int, max_lpc_order: int, qlp_precision: int,
                  partition_orders: tuple[int, ...]) -> bytes:
    from flacx.oracle.encoder import EncoderParameters, encode_frame

    channels = pcm_rows.shape[1]
    params = EncoderParameters(
        block_size=block_size,
        rice_partition_order=range(min(partition_orders),
                                   max(partition_orders) + 1),
        lpc_order=range(0, max_lpc_order + 1),
        qlp_precision=qlp_precision)
    planar = [list(map(int, pcm_rows[:, c])) for c in range(channels)]
    return encode_frame(planar, INDEPENDENT_CHANNELS[channels], index, bps,
                        params)


def encode_to_file(f: BinaryIO, pcm: np.ndarray, *, sample_rate: int,
                   bps: int, channels: int, block_size: int,
                   max_lpc_order: int, qlp_precision: int,
                   partition_orders: tuple[int, ...], batch_frames: int = 256,
                   stereo: str = "auto", device: bool = True,
                   wasted_bits: bool = False, order_search: str = "estimate",
                   sharding=None, collect_stats: bool = False) -> dict:
    """Encode interleaved PCM ``[frames, channels]`` into ``f`` (seekable).

    Returns a stats dict (bytes in/out, frame count, samples).
    """
    total = pcm.shape[0]
    writer = StreamWriter(f, sample_rate, bps, channels, total, block_size)
    writer.add_pcm(pcm)

    n_full = total // block_size
    tail = total - n_full * block_size

    if device and n_full:
        from flacx.encoder import BatchEncoder, EncoderConfig
        cfg = EncoderConfig(
            sample_rate=sample_rate, bps=bps, channels=channels,
            block_size=block_size, max_lpc_order=max_lpc_order,
            qlp_precision=qlp_precision, partition_orders=partition_orders,
            stereo=stereo, wasted_bits=wasted_bits,
            order_search=order_search)
        enc = BatchEncoder(cfg, batch_frames=batch_frames,
                           sharding=sharding)
        planar = (pcm[: n_full * block_size]
                  .reshape(n_full, block_size, channels)
                  .transpose(0, 2, 1).astype(np.int32))
        run_stats: dict | None = {} if collect_stats else None
        writer.write_frames(enc.encode_frames(planar, 0, stats=run_stats))
    else:
        for i in range(n_full):
            rows = pcm[i * block_size:(i + 1) * block_size]
            writer.write_frame(_oracle_frame(
                rows, i, bps, block_size, max_lpc_order, qlp_precision,
                partition_orders))

    if tail:
        rows = pcm[n_full * block_size:]
        writer.write_frame(_oracle_frame(
            rows, n_full, bps, block_size, max_lpc_order, qlp_precision,
            partition_orders))

    writer.finalize()
    result = {
        "samples": total,
        "frames": n_full + (1 if tail else 0),
        "bytes_in": pcm.shape[0] * channels * (bps // 8),
        "bytes_out": f.tell(),
    }
    if collect_stats and device and n_full:
        result["stats"] = run_stats
    return result


def encode_best(f: BinaryIO, pcm: np.ndarray, *, sample_rate: int, bps: int,
                channels: int,
                block_sizes: tuple[int, ...] = (1152, 2304, 4608),
                max_lpc_order: int = 12, qlp_precision: int = 5,
                partition_orders: tuple[int, ...] = (0, 1, 2, 3, 4, 5),
                batch_frames: int = 256, stereo: str = "auto",
                wasted_bits: bool = False) -> dict:
    """Best-compression sweep (BASELINE configs[4]): encode the file at
    every candidate block size with exact per-order search and keep the
    smallest result.  Each candidate is a full device-batched encode; the
    winner's bytes are written to ``f``.
    """
    import io as _io

    best = None
    for bs in block_sizes:
        buf = _io.BytesIO()
        stats = encode_to_file(
            buf, pcm, sample_rate=sample_rate, bps=bps, channels=channels,
            block_size=bs, max_lpc_order=max_lpc_order,
            qlp_precision=qlp_precision, partition_orders=partition_orders,
            batch_frames=batch_frames, stereo=stereo,
            wasted_bits=wasted_bits, order_search="exact")
        if best is None or stats["bytes_out"] < best[1]["bytes_out"]:
            best = (buf.getvalue(), stats, bs)
    f.write(best[0])
    best[1]["block_size"] = best[2]
    return best[1]
