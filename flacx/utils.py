"""Cross-cutting helpers (host side).

Parity: reference flac/utils.py (batch/group/clamp/log2i/zigzag/argparse_range).
Implementations are original; only the observable behaviour matches.
"""

from __future__ import annotations

from itertools import islice
from typing import Iterable, Iterator, Sequence, TypeVar

T = TypeVar("T")


def argparse_range(s: str) -> range:
    """Parse ``"N"`` or ``"M,N"`` into the inclusive range ``[M, N]`` as a
    half-open ``range(M, N + 1)`` (M defaults to 0).

    Parity: reference flac/utils.py:12-28.

    >>> argparse_range('5')
    range(0, 6)
    >>> argparse_range('2,5')
    range(2, 6)
    """
    parts = [int(p) for p in s.split(",")]
    if not 1 <= len(parts) <= 2:
        raise ValueError(f"expected 'N' or 'M,N', got {s!r}")
    if len(parts) == 2 and parts[0] >= parts[1]:
        raise ValueError(f"range must be strictly increasing, got {s!r}")
    lo, hi = (0, parts[0]) if len(parts) == 1 else (parts[0], parts[1])
    return range(lo, hi + 1)


def batch(it: Iterable[T], n: int) -> Iterator[list[T]]:
    """Chunk an iterable into lists of length ``n`` (last may be shorter).

    Parity: reference flac/utils.py:31-40.

    >>> [x for x in batch(iter('ABCDEFG'), 3)]
    [['A', 'B', 'C'], ['D', 'E', 'F'], ['G']]
    """
    if n < 1:
        raise ValueError("n must be greater than zero")
    it = iter(it)
    while chunk := list(islice(it, n)):
        yield chunk


def group(xs: Sequence[T], n: int) -> list[Sequence[T]]:
    """Split a sequence into consecutive groups of ``n``.

    Parity: reference flac/utils.py:61-66.

    >>> group([1, 2, 3, 4, 5, 6], 2)
    [[1, 2], [3, 4], [5, 6]]
    """
    return [xs[i:i + n] for i in range(0, len(xs), n)]


def clamp(x: int, lo: int, hi: int) -> int:
    """Clamp ``x`` into ``[lo, hi]``.  Parity: reference flac/utils.py:43-48."""
    return lo if x < lo else hi if x > hi else x


def log2i(x: int) -> int:
    """Floor base-2 integer logarithm.  Parity: reference flac/utils.py:73-80.

    >>> log2i(1), log2i(2), log2i(3), log2i(4608)
    (0, 1, 1, 12)
    """
    if x <= 0:
        raise ValueError("log2i requires a positive argument")
    return x.bit_length() - 1


def zigzag_encode(x: int) -> int:
    """Map a signed integer to an unsigned 'folded' integer.

    Parity: reference flac/utils.py:91-94 (64-bit word assumption).

    >>> [zigzag_encode(v) for v in (0, -1, 1, -2, 2)]
    [0, 1, 2, 3, 4]
    """
    return (x << 1) ^ (x >> 63) if -(1 << 63) < x < (1 << 63) else _zz_raise(x)


def _zz_raise(x: int) -> int:
    raise OverflowError(f"zigzag domain exceeded: {x}")


def zigzag_decode(x: int) -> int:
    """Inverse of :func:`zigzag_encode`.  Parity: reference flac/utils.py:87-88.

    >>> [zigzag_decode(v) for v in (0, 1, 2, 3, 4)]
    [0, -1, 1, -2, 2]
    """
    return (x >> 1) ^ -(x & 1)


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache, reliably.

    ``JAX_COMPILATION_CACHE_DIR`` only works when set before ``import
    jax`` — but some environments preload jax at interpreter startup
    (sitecustomize), silently disabling the env-var route.  The config
    API works any time before the first compilation, so every flacx
    entry point (CLI, bench, tools) funnels through here.

    CPU backends are a NO-OP (round 5): this environment's VM migrates
    between physical hosts with different CPU feature sets, and XLA:CPU
    AOT cache entries compiled under one feature set segfault when
    loaded under another (the cache key does not include host CPU
    features).  TPU/accelerator executables are host-agnostic and keep
    the cache.

    Args:
      path: cache directory; defaults to ``$JAX_COMPILATION_CACHE_DIR``
        or ``~/.cache/flacx/xla``.
    """
    import os

    import jax

    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        pass
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "flacx",
                            "xla"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
