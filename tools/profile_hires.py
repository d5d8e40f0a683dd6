"""Device trace of the hi-res encode config (BASELINE configs[2]).

Usage:  python tools/profile_hires.py [batch_frames]

24-bit/96 kHz stereo, LPC order ≤ 32, block 16384, partition orders
0..15 — the config VERDICT r3 item 2 targets.  Prints top device ops by
per-iteration time (grouped by op name).
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.encoder import BatchEncoder, EncoderConfig

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = 16384
    iters = 4
    cfg = EncoderConfig(block_size=n, max_lpc_order=32, bps=24,
                        sample_rate=96000, partition_orders=tuple(range(16)))
    enc = BatchEncoder(cfg, batch_frames=b)

    rng = np.random.default_rng(1)
    sig = ((0.6 * np.sin(2 * np.pi * 0.002 * np.arange(b * n))
            + 0.02 * rng.standard_normal(b * n)) * 20000 * 256)
    planar = jnp.asarray(np.clip(np.stack([sig, np.roll(sig, 3)], 0),
                                 -(1 << 23), (1 << 23) - 1)
                         .astype(np.int32).reshape(2, b, n)
                         .transpose(1, 0, 2))

    def _force(p, i):
        out = enc._fn(p, i)
        return (jnp.sum(out["length"])
                + jnp.sum(out["bytes"].astype(jnp.uint32)).astype(jnp.int64))

    f = jax.jit(_force)
    int(f(planar, jnp.int64(0)))

    with jax.profiler.trace("/tmp/flacx_trace_hires"):
        for i in range(iters):
            r = f(planar + i, jnp.int64(i))
        int(r)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(
        "/tmp/flacx_trace_hires/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
        tot = sum(totals.values())
        print(f"== {plane.name} — total {tot / iters:.2f} ms/iter ==")
        cum = 0.0
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
            cum += ms
            print(f"  {ms / iters:9.3f}  {100 * cum / tot:5.1f}%  "
                  f"{name[:95]}")
        break


if __name__ == "__main__":
    main()
