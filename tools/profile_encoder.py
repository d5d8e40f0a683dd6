"""Capture and summarize a device trace of the encode pipeline.

Usage:  python tools/profile_encoder.py [batch_frames]

Writes the trace under /tmp/flacx_trace and prints the top device ops by
time.  Works over the axon tunnel (device timeline only; host gaps are
dispatch overhead, ~28 ms each in this environment — see
.claude/skills/verify/SKILL.md).
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
        # consume bytes + CRC too: a lengths-only sum lets XLA dead-code-
        # eliminate the word merge / byte assembly / CRC tail (see bench.py)
        out = enc._fn(p, i)
        return (jnp.sum(out["length"])
                + jnp.sum(out["bytes"].astype(jnp.uint32)).astype(jnp.int64))

    f = jax.jit(_force)
    int(f(planar, jnp.int64(0)))

    with jax.profiler.trace("/tmp/flacx_trace"):
        for i in range(iters):
            r = f(planar + i, jnp.int64(i))
        int(r)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(
        "/tmp/flacx_trace/plugins/profile/*/*.xplane.pb"))[-1]
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
