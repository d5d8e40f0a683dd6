"""Stable encode-pipeline cost: device-busy ms per batch from a trace.

Usage: python tools/measure_encode.py [batch_frames] [iters]

The fori-loop slope method (bench.py) rides the dev tunnel and varies
±0.5 ms run to run; the device timeline's busy time for K traced
iterations is repeatable to ~1%.  Prints one number: XLA-module busy
ms / iteration (full pipeline, byte+CRC outputs forced).
"""

import glob
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np

TRACE = "/tmp/flacx_measure_trace"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.encoder import BatchEncoder, EncoderConfig

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = 4608
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

    shutil.rmtree(TRACE, ignore_errors=True)
    with jax.profiler.trace(TRACE):
        for i in range(iters):
            r = f(planar + i, jnp.int64(i))
        int(r)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(f"{TRACE}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        best = 0.0
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                if "_force" in name or "jit__lambda" in name \
                        or "unknown" in name:
                    best += ev.duration_ps / 1e9
        print(f"{best / iters:.3f}")
        return


if __name__ == "__main__":
    main()
