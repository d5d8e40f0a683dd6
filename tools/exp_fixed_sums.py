"""Experiment: fixed-order candidate sum restructure.

Current encoder computes the five fixed-order zigzag sums as a
sequential diff chain with five separate emulated-int64 reduces (six
bitcast_reduce fusions, ~1.3 ms/batch).  Variants:

  A  chain + int64 sums          (current)
  B  binomial diffs + int64 sums (independent -> sibling fusion?)
  C  binomial diffs + two-stage sum: int32 inner 128, int64 outer

Run on the real chip: python tools/exp_fixed_sums.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.ops import rice
    from flacx.ops.fixedpred import shift_right_one
    from flacx.ops.lpc import shift_right_k

    b, v, n = 1024, 4, 4608
    i_pos = jnp.arange(n, dtype=jnp.int32)

    def variant_a(x):
        cols = []
        cur = x
        for o in range(5):
            if o:
                cur = cur - shift_right_one(cur)
            cols.append(jnp.sum(rice.zigzag(cur) * (i_pos >= o),
                                axis=-1, dtype=jnp.int64))
        return jnp.stack(cols, axis=-1)

    BINOM = [[1], [1, -1], [1, -2, 1], [1, -3, 3, -1], [1, -4, 6, -4, 1]]

    def diffs(x):
        xs = [shift_right_k(x, j) for j in range(5)]
        out = []
        for o in range(5):
            d = xs[0] * BINOM[o][0]
            for j in range(1, o + 1):
                d = d + xs[j] * BINOM[o][j]
            out.append(d)
        return out

    def variant_b(x):
        return jnp.stack(
            [jnp.sum(rice.zigzag(d) * (i_pos >= o), axis=-1,
                     dtype=jnp.int64)
             for o, d in enumerate(diffs(x))], axis=-1)

    def variant_c(x):
        cols = []
        for o, d in enumerate(diffs(x)):
            zz = rice.zigzag(d) * (i_pos >= o)
            inner = jnp.sum(zz.reshape(b, v, n // 128, 128), axis=-1,
                            dtype=jnp.int32)
            cols.append(jnp.sum(inner, axis=-1, dtype=jnp.int64))
        return jnp.stack(cols, axis=-1)

    rng = np.random.default_rng(3)
    x_np = rng.integers(-(1 << 16), 1 << 16, size=(b, v, n)).astype(np.int32)
    x = jax.device_put(jnp.asarray(x_np))

    fa = jax.jit(variant_a)
    fb = jax.jit(variant_b)
    fc = jax.jit(variant_c)

    ra, rb, rc = np.asarray(fa(x)), np.asarray(fb(x)), np.asarray(fc(x))
    assert np.array_equal(ra, rb), "B mismatch"
    assert np.array_equal(ra, rc), "C mismatch"
    print("all variants bit-identical")

    # device-side loop slope (the tunnel charges ~22 ms per dispatch)
    def slope(variant, k1=4, k2=36):
        def many(iters):
            def fn(p):
                def body(i, acc):
                    r = variant(p + (i % 3).astype(jnp.int32))
                    return acc + jnp.sum(r)
                return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
            return jax.jit(fn)
        fs, fb_ = many(k1), many(k2)
        int(fs(x)); int(fb_(x))
        t0 = time.perf_counter(); int(fs(x)); t1 = time.perf_counter()
        int(fb_(x)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3

    for name, f in (("A chain+i64", variant_a), ("B binom+i64", variant_b),
                    ("C binom+2stage", variant_c)):
        print(f"{name}: {slope(f):.3f} ms/batch")


if __name__ == "__main__":
    main()
