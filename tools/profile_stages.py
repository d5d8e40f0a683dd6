"""Per-stage device timing of the encode pipeline (slope method).

Usage: python tools/profile_stages.py [batch_frames]

Times _encode_batch truncated at each _stop_after stage with the
device-side fori_loop slope method (the dev tunnel's per-dispatch cost
is excluded).  Stage deltas approximate each section's device cost —
approximate because truncation also removes dead code XLA would have
fused differently.
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

    def leaf_sum(d):
        tot = jnp.int64(0)
        for v in jax.tree_util.tree_leaves(d):
            tot = tot + jnp.sum(v).astype(jnp.int64)
        return tot

    def slope(stage, k1=4, k2=24):
        def many(iters):
            def fn(p):
                def body(i, acc):
                    out = _encode_batch(cfg, p + (i % 3).astype(jnp.int32),
                                        jnp.int64(0), _stop_after=stage)
                    return acc + leaf_sum(out)
                return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
            return jax.jit(fn)
        fs, fb = many(k1), many(k2)
        int(fs(planar)); int(fb(planar))
        t0 = time.perf_counter(); int(fs(planar)); t1 = time.perf_counter()
        int(fb(planar)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3

    prev = 0.0
    for stage in STAGES:
        ms = slope(stage)
        name = stage or "full"
        print(f"{name:10s} {ms:7.3f} ms  (+{ms - prev:6.3f})")
        prev = ms


if __name__ == "__main__":
    main()
