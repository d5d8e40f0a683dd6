"""Per-stage encode timings via the pipeline's ``_stop_after`` taps.

Usage:  python tools/stage_times.py [batch_frames]

Times each truncated pipeline with the slope method (K vs 2K queued
dispatches with distinct inputs), so per-dispatch tunnel overhead
cancels.  Stage deltas show where device time goes.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np

STAGES = ["analysis", "select", "residual", "plan", "emit", "pack", None]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.encoder import EncoderConfig, _encode_batch

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = 4608
    cfg = EncoderConfig(block_size=n, max_lpc_order=12)

    rng = np.random.default_rng(1)
    sig = (0.6 * np.sin(2 * np.pi * 0.005 * np.arange(b * n))
           + 0.02 * rng.standard_normal(b * n)) * 20000
    planar = jnp.asarray(np.stack([sig, np.roll(sig, 3)], 0)
                         .astype(np.int32).reshape(2, b, n)
                         .transpose(1, 0, 2))

    def leaf_sum(out):
        return sum(jnp.sum(v.astype(jnp.int64)) for v in out.values()
                   if v.dtype != bool) + sum(
            jnp.sum(v) for v in out.values() if v.dtype == bool)

    def slope_ms(fn, k1=6, k2=18):
        outs = [fn(planar + i, jnp.int64(i)) for i in range(2)]
        jax.block_until_ready(outs)
        ts = []
        for k in (k1, k2):
            t0 = time.perf_counter()
            acc = []
            for i in range(k):
                acc.append(fn(planar + (i % 7), jnp.int64(i)))
            jax.block_until_ready(acc)
            ts.append(time.perf_counter() - t0)
        return (ts[1] - ts[0]) / (k2 - k1) * 1e3

    prev = 0.0
    for st in STAGES:
        f = jax.jit(lambda p, i, _st=st: leaf_sum(
            _encode_batch(cfg, p, i, _stop_after=_st)))
        ms = slope_ms(f)
        name = st or "FULL"
        print(f"  {name:10s} cumulative {ms:7.2f} ms   stage Δ {ms - prev:7.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()
