"""Per-op HBM byte estimate of the compiled encode program.

Usage: python tools/traffic_report.py [batch_frames] [hires]

Parses the post-fusion entry computation of the compiled headline encode
program and charges each non-fusion-internal op operand+output bytes by
shape — the same accounting XLA's aggregate "bytes accessed" uses — so
the 7.7 GB/batch of BENCH_r04 can be attributed to specific ops.
"""

import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np  # noqa: E402

DT_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
            "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
            "f64": 8}

SHAPE_RE = re.compile(r"\b(pred|[suf]\d+|bf16)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        total += nelem * DT_BYTES.get(dt, 4)
    return total


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flacx.encoder import BatchEncoder, EncoderConfig

    hires = len(sys.argv) > 2 and sys.argv[2] == "hires"
    if hires:
        b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        n = 16384
        cfg = EncoderConfig(block_size=n, max_lpc_order=32, bps=24,
                            sample_rate=96000,
                            partition_orders=tuple(range(16)))
    else:
        b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
        n = 4608
        cfg = EncoderConfig(block_size=n, max_lpc_order=12)
    enc = BatchEncoder(cfg, batch_frames=b)
    planar = jnp.zeros((b, 2, n), jnp.int32)
    compiled = enc._fn.lower(planar, jnp.int64(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"aggregate bytes accessed: "
          f"{float(ca.get('bytes accessed', 0)) / 1e9:.3f} GB")

    text = compiled.as_text()
    # entry computation: from "ENTRY" to its closing brace at depth 0
    m = re.search(r"^ENTRY [^\n]*\{$", text, re.M)
    entry = text[m.end():]
    end = entry.index("\n}")
    entry = entry[:end]

    groups = defaultdict(lambda: [0, 0])
    rows = []
    for line in entry.splitlines():
        line = line.strip()
        if not line or "=" not in line:
            continue
        mm = re.match(r"%?([\w.\-]+)\s*=\s*(.*)", line)
        if not mm:
            continue
        name, rhs = mm.groups()
        opk = re.search(r"\b([a-z][\w\-]*)\(", rhs)
        kind = opk.group(1) if opk else rhs.split()[0]
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast"):
            continue
        by = shape_bytes(line.split(" metadata=")[0]
                         .split(", calls=")[0])
        # pull fusion/custom-call target hint
        hint = ""
        hm = re.search(r'custom_call_target="([^"]+)"', line)
        if hm:
            hint = hm.group(1)
        fm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
        if fm and not hint:
            hint = fm.group(1)
        om = re.search(r'op_name="([^"]+)"', line)
        opname = om.group(1) if om else ""
        rows.append((by, name, kind, hint, opname))
        key = hint or kind
        groups[key][0] += by
        groups[key][1] += 1

    rows.sort(reverse=True)
    print("\n== top ops by operand+output bytes ==")
    for by, name, kind, hint, opname in rows[:40]:
        print(f"  {by / 1e6:9.1f} MB  {kind:14s} {name[:34]:34s} "
              f"{(hint or '')[:28]:28s} {opname[:60]}")
    total = sum(r[0] for r in rows)
    print(f"\nsummed over entry ops: {total / 1e9:.3f} GB")


if __name__ == "__main__":
    main()
