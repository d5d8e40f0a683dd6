"""Test fixtures (backend setup lives in the repo-root conftest.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0xF1AC)


def make_pcm(rng, frames: int, channels: int, bps: int,
             kind: str = "tonal") -> np.ndarray:
    """Synthesize test PCM shaped [frames, channels] int32."""
    amp = (1 << (bps - 1)) - 1
    t = np.arange(frames, dtype=np.float64)
    out = np.zeros((frames, channels), dtype=np.float64)
    for c in range(channels):
        if kind == "tonal":
            f0 = 220.0 * (c + 1) / 44100.0
            sig = (0.6 * np.sin(2 * np.pi * f0 * t)
                   + 0.25 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.3)
                   + 0.02 * rng.standard_normal(frames))
        elif kind == "noise":
            sig = rng.standard_normal(frames) * 0.5
        elif kind == "silence":
            sig = np.zeros(frames)
        elif kind == "impulse":
            sig = np.zeros(frames)
            sig[:: max(1, frames // 7)] = 0.9
        else:
            raise ValueError(kind)
        out[:, c] = np.clip(sig, -1.0, 1.0) * amp * 0.8
    return out.astype(np.int64).astype(np.int32)
