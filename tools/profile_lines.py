"""Per-line (execution-unit) device trace of the encode pipeline.

Usage:  python tools/profile_lines.py [batch_frames]

The flat op summary in profile_encoder.py sums async copy durations that
OVERLAP compute, so totals exceed wall time.  This tool prints, per
XPlane line (TensorCore thread / DMA queue), the busy time and top ops,
which shows what is actually on the critical path.
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
    import jax.numpy as jnp

    from flacx.encoder import BatchEncoder, EncoderConfig

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = 4608
    iters = 4
    cfg = EncoderConfig(block_size=n, max_lpc_order=12)
    enc = BatchEncoder(cfg, batch_frames=b)

    rng = np.random.default_rng(1)
    sig = (0.6 * np.sin(2 * np.pi * 0.005 * np.arange(b * n))
           + 0.02 * rng.standard_normal(b * n)) * 20000
    planar = jnp.asarray(np.stack([sig, np.roll(sig, 3)], 0)
                         .astype(np.int32).reshape(2, b, n)
                         .transpose(1, 0, 2))

    def _force(p, i):
        out = enc._fn(p, i)
        return (jnp.sum(out["length"])
                + jnp.sum(out["bytes"].astype(jnp.uint32)).astype(jnp.int64))

    f = jax.jit(_force)
    int(f(planar, jnp.int64(0)))

    with jax.profiler.trace("/tmp/flacx_trace_lines"):
        for i in range(iters):
            r = f(planar + i, jnp.int64(i))
        int(r)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(
        "/tmp/flacx_trace_lines/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if not line.events:
                continue
            busy = sum(ev.duration_ps for ev in line.events) / 1e9 / iters
            lo = min(ev.offset_ps for ev in line.events)
            hi = max(ev.offset_ps + ev.duration_ps for ev in line.events)
            span = (hi - lo) / 1e9 / iters
            print(f"-- line '{line.name}': busy {busy:.3f} ms/iter, "
                  f"span {span:.3f} ms/iter, {len(line.events)} events")
            totals = defaultdict(float)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:8]:
                print(f"     {ms / iters:9.3f}  {name[:90]}")
        break


if __name__ == "__main__":
    main()
