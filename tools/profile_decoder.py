"""Capture and summarize a device trace of the decode pipeline.

Usage:  python tools/profile_decoder.py [batch_frames]

Encodes a synthetic batch first (so the decode input is a real FLAC
stream), then traces the fused rows→PCM device decode program and prints
the top device ops by time.  Companion to tools/profile_encoder.py.
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np


def main() -> None:
    import jax

    from flacx.decoder import (_device_decode_fn, parse_stream_header,
                               scan_frame_offsets)
    from flacx.encoder import BatchEncoder, EncoderConfig
    from flacx.format import MAGIC, MetadataBlockType, Streaminfo
    from flacx.native import scan_frames
    from flacx.oracle.encoder import (serialize_metadata_header,
                                      serialize_streaminfo)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = 4608
    iters = 4
    cfg = EncoderConfig(block_size=n, max_lpc_order=12)
    enc = BatchEncoder(cfg, batch_frames=b)

    rng = np.random.default_rng(1)
    sig = (0.6 * np.sin(2 * np.pi * 0.005 * np.arange(b * n))
           + 0.02 * rng.standard_normal(b * n)) * 20000
    planar = (np.stack([sig, np.roll(sig, 3)], 0).astype(np.int32)
              .reshape(2, b, n).transpose(1, 0, 2))
    result = enc.encode_batch_device(planar, 0)
    lens = np.asarray(result["length"])
    data = np.asarray(result["bytes"])
    stream = (MAGIC
              + serialize_metadata_header(True, MetadataBlockType.Streaminfo,
                                          34)
              + serialize_streaminfo(Streaminfo(n, n, 0, 0, 44100, 2, 16,
                                                n * b, bytes(16)))
              + b"".join(data[i, : lens[i]].tobytes() for i in range(b)))

    si, first = parse_stream_header(stream)
    offsets = scan_frame_offsets(stream, first, block_size=n)
    arr = np.frombuffer(stream, np.uint8)
    ends = np.append(offsets[1:], len(stream))
    dlens = (ends - offsets).astype(np.int64)
    width = (int(dlens.max()) + 255) // 256 * 256
    rows8 = np.zeros((b, width), np.uint8)
    for i, (o, e) in enumerate(zip(offsets, ends)):
        rows8[i, : e - o] = arr[o:e]
    scan = scan_frames(rows8, np.zeros(b, np.int64), n, 2, 16)
    t_bucket = next(x for x in (4, 8, 12, 16, 32)
                    if x >= max(4, int(scan.order.max())))
    use_i32 = 17 + max(int(np.abs(scan.taps).sum(-1).max()),
                       1).bit_length() + 2 <= 31
    span = 64 + int(np.diff(scan.ckpt_pos, axis=-1).max())
    sw = next(x for x in (8, 12, 16, 24, 32, 48, 64, 96, 128)
              if x >= span // 32 + 4)
    dfn = _device_decode_fn(n, 2, 16, scan.ckpt_interval, t_bucket, sw,
                            use_i32, True)
    dargs = jax.device_put(
        (rows8, dlens.astype(np.int32), scan.channel_code, scan.kind,
         scan.order, scan.shift, scan.wasted, scan.po, scan.width,
         scan.taps, scan.warmup, scan.const_val, scan.ckpt_pos,
         scan.ckpt_param, scan.ckpt_esc, scan.ckpt_inesc))
    jax.block_until_ready(dfn(*dargs))

    with jax.profiler.trace("/tmp/flacx_trace_dec"):
        outs = [dfn(*dargs) for _ in range(iters)]
        jax.block_until_ready(outs)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(
        "/tmp/flacx_trace_dec/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
        print(f"== {plane.name} — top ops, ms per iteration ==")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ms / iters:9.3f}  {name[:100]}")
        break


if __name__ == "__main__":
    main()
