"""wav read/write via stdlib `wave` — int16 PCM only (component C9/C10)."""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a mono/ multi-channel 16-bit PCM wav. Returns (float32 in [-1,1], sr).

    Multi-channel audio is averaged to mono (the reference pipeline is mono
    speech; SURVEY.md C2).
    """
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={sw}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: str | Path, x: np.ndarray, sample_rate: int) -> None:
    """Write float array in [-1, 1] as 16-bit PCM mono wav."""
    x = np.asarray(x, dtype=np.float32)
    q = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(q.tobytes())
