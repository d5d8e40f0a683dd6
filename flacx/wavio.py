"""Bulk WAV I/O.

The reference reads one PCM frame per call (``readframes(1)``,
flac/__main__.py:82-92) and converts each sample with ``int.from_bytes`` —
here whole files move through numpy in one shot (8/16/24/32-bit PCM).
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np


def read_wav(path: Path | str) -> tuple[int, int, int, np.ndarray]:
    """Read a PCM WAV file.

    Returns ``(sample_rate, bits_per_sample, channels, pcm)`` with ``pcm``
    int32 ``[frames, channels]`` (8-bit WAV's unsigned samples are
    recentred to signed).
    """
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        width = w.getsampwidth()
        channels = w.getnchannels()
        frames = w.getnframes()
        raw = w.readframes(frames)

    if width == 1:
        pcm = np.frombuffer(raw, np.uint8).astype(np.int32) - 128
    elif width == 2:
        pcm = np.frombuffer(raw, "<i2").astype(np.int32)
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        pcm = u.astype(np.int32)
        pcm = np.where(pcm >= 1 << 23, pcm - (1 << 24), pcm)
    elif width == 4:
        pcm = np.frombuffer(raw, "<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported sample width {width}")
    return sr, width * 8, channels, pcm.reshape(-1, channels)


def pcm_to_le_bytes(pcm: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian sample bytes (the MD5/WAV payload form)."""
    flat = pcm.reshape(-1)
    if bps == 8:
        return flat.astype(np.int8).tobytes()
    if bps == 16:
        return flat.astype("<i2").tobytes()
    if bps == 24:
        u = flat.astype(np.int32).view(np.uint32) & 0xFFFFFF
        out = np.empty((flat.size, 3), np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        return out.tobytes()
    if bps == 32:
        return flat.astype("<i4").tobytes()
    raise ValueError(f"unsupported bits per sample {bps}")


def write_wav(path: Path | str, sample_rate: int, bps: int,
              pcm: np.ndarray) -> None:
    """Write int32 ``[frames, channels]`` PCM as a WAV file."""
    if bps % 8:
        raise ValueError("WAV requires whole-byte sample sizes")
    payload = pcm_to_le_bytes(pcm, bps)
    if bps == 8:  # WAV stores 8-bit audio unsigned
        payload = (np.frombuffer(payload, np.int8).astype(np.int16) + 128
                   ).astype(np.uint8).tobytes()
    with wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(bps // 8)
        w.setframerate(sample_rate)
        w.writeframes(payload)
