"""Compression benchmark: flacx vs the reference on an identical corpus.

Encodes the same multi-class signal corpus with the reference encoder
(/root/reference, its CLI defaults: block 4608, LPC 0..12, precision 5,
partition orders 0..5 — flac/__main__.py:19-22) and with flacx at three
settings (default estimate-mode order search, --exact-order-search, and
--best), then reports per-signal compressed sizes and deltas.

Writes ``COMPRESSION.json`` at the repo root and prints a table.  The
headline claim this artifact backs: flacx at exact settings is never
worse than the reference on any signal class (VERDICT.md item 6).

Usage: python tools/compression_bench.py [seconds_per_signal]
"""

from __future__ import annotations

import io
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flacx_jax_cache_tpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from flacx.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()  # env route is dead when jax is preloaded

import numpy as np

SR = 44100
BPS = 16


def make_corpus(seconds: float) -> dict[str, np.ndarray]:
    """Signal classes chosen to exercise distinct codec behaviors."""
    n = int(SR * seconds)
    t = np.arange(n) / SR
    rng = np.random.default_rng(0xC0DEC)

    def st(left, right):
        pcm = np.stack([left, right], axis=1)
        return np.clip(pcm * 32767, -32768, 32767).astype(np.int32)

    tone = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1177 * t + 0.4)
    return {
        # near-identical channels: stereo decorrelation pays
        "tonal_correlated": st(tone, tone * 0.94
                               + 0.01 * np.sin(2 * np.pi * 331 * t)),
        # unrelated channels
        "tonal_independent": st(tone, 0.5 * np.sin(2 * np.pi * 523.25 * t)),
        # broadband but predictable envelope
        "sweep": st(0.6 * np.sin(2 * np.pi * (200 + 4000 * t) * t),
                    0.6 * np.sin(2 * np.pi * (8000 - 3000 * t) * t)),
        # music-like: tones + noise floor
        "mixed": st(tone * np.sin(2 * np.pi * 1.5 * t) ** 2
                    + 0.02 * rng.standard_normal(n),
                    tone * np.cos(2 * np.pi * 1.5 * t) ** 2
                    + 0.02 * rng.standard_normal(n)),
        # hard-to-compress noise at two levels
        "noise_full": st(0.9 * rng.standard_normal(n) / 3,
                         0.9 * rng.standard_normal(n) / 3),
        "noise_quiet": st(0.004 * rng.standard_normal(n),
                          0.004 * rng.standard_normal(n)),
        # sparse impulses in silence (partitioning/constant pays)
        "impulse": st(np.where(np.arange(n) % 5000 == 0, 0.8, 0.0),
                      np.where(np.arange(n) % 7000 == 3, -0.7, 0.0)),
        # digital silence (the reference encoder crashes: SURVEY §2.3.2)
        "silence": np.zeros((n, 2), np.int32),
    }


def encode_reference(pcm: np.ndarray, max_porder: int = 5) -> int | None:
    sys.path.insert(0, "/root/reference")
    from flac.encoder import EncoderParameters, encode
    params = EncoderParameters(block_size=4608,
                               rice_partition_order=range(0, max_porder + 1),
                               lpc_order=range(0, 13), qlp_precision=5)
    rows = [[int(a), int(b)] for a, b in pcm]
    try:
        return len(b"".join(encode(SR, BPS, 2, len(rows), iter(rows),
                                   params)))
    except Exception as e:  # silence crashes it (ZeroDivisionError)
        print(f"    reference encoder failed: {type(e).__name__}: {e}")
        return None


def encode_flacx(pcm: np.ndarray, mode: str, max_porder: int = 5) -> int:
    from flacx import pipeline
    buf = io.BytesIO()
    common = dict(sample_rate=SR, bps=BPS, channels=2,
                  max_lpc_order=12, qlp_precision=5,
                  partition_orders=tuple(range(max_porder + 1)),
                  batch_frames=16)
    if mode == "best":
        pipeline.encode_best(buf, pcm, **common)
    else:
        pipeline.encode_to_file(buf, pcm, block_size=4608,
                                order_search=mode, **common)
    return buf.tell()


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    corpus = make_corpus(seconds)
    results: dict[str, dict] = {}

    for name, pcm in corpus.items():
        print(f"[{name}]")
        wav_bytes = pcm.shape[0] * 2 * (BPS // 8)
        row: dict = {"wav_bytes": wav_bytes}
        row["reference_default"] = encode_reference(pcm)
        for mode, key in (("estimate", "flacx_default"),
                          ("exact", "flacx_exact"),
                          ("best", "flacx_best")):
            row[key] = encode_flacx(pcm, mode)
        # full requested partition range -r 0..15 (VERDICT round-2 #1:
        # the former 64-sample floor silently truncated this to 0..6;
        # both encoders now search the identical legal set 0..9 at 4608)
        row["reference_r15"] = encode_reference(pcm, max_porder=15)
        row["flacx_exact_r15"] = encode_flacx(pcm, "exact", max_porder=15)
        for k in ("reference_default", "flacx_default", "flacx_exact",
                  "flacx_best", "reference_r15", "flacx_exact_r15"):
            if row[k] is not None:
                row[f"{k}_ratio"] = round(row[k] / wav_bytes, 4)
        if row["reference_default"] is not None:
            for k in ("flacx_default", "flacx_exact", "flacx_best"):
                row[f"{k}_vs_ref_pct"] = round(
                    100.0 * (row[k] - row["reference_default"])
                    / row["reference_default"], 2)
        if row["reference_r15"] is not None:
            row["flacx_exact_r15_vs_ref_pct"] = round(
                100.0 * (row["flacx_exact_r15"] - row["reference_r15"])
                / row["reference_r15"], 2)
        results[name] = row
        print(f"    ref={row['reference_default']}  "
              f"flacx est/exact/best={row['flacx_default']}/"
              f"{row['flacx_exact']}/{row['flacx_best']}  "
              f"r15 ref/flacx={row['reference_r15']}/"
              f"{row['flacx_exact_r15']}")

    never_worse_exact = all(
        r["flacx_exact"] <= r["reference_default"]
        for r in results.values() if r["reference_default"] is not None)
    never_worse_r15 = all(
        r["flacx_exact_r15"] <= r["reference_r15"]
        for r in results.values() if r["reference_r15"] is not None)
    artifact = {
        "config": {"sample_rate": SR, "bps": BPS, "channels": 2,
                   "seconds_per_signal": seconds, "block_size": 4608,
                   "max_lpc_order": 12, "qlp_precision": 5,
                   "partition_orders": [0, 1, 2, 3, 4, 5]},
        "never_worse_at_exact_settings": never_worse_exact,
        "never_worse_at_r15": never_worse_r15,
        "signals": results,
    }
    out = os.path.join(REPO, "COMPRESSION.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nnever_worse_at_exact_settings: {never_worse_exact}")
    print(f"never_worse_at_r15: {never_worse_r15}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
