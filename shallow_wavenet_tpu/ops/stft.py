"""STFT + mel filterbank, XLA-native (component C2; SURVEY.md §2.3).

Replaces librosa/C STFT with jnp framing + rFFT and the mel filterbank as a
single dense matmul (MXU-friendly). No external audio libs exist in this
environment, so the filterbank (HTK-style mel scale, Slaney-style area
normalization off) is built from scratch in numpy at trace time.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft//2 + 1, n_mels), float32."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def frame_signal(x, frame_length: int, hop_length: int, center: bool = True):
    """(..., T) -> (..., n_frames, frame_length) via gather (static shapes)."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft_magnitude(x, n_fft: int, hop_length: int, win_length: int,
                   center: bool = True):
    """|STFT| of (..., T) -> (..., n_frames, n_fft//2 + 1)."""
    frames = frame_signal(x, win_length, hop_length, center=center)
    win = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    frames = frames * win
    if win_length < n_fft:
        pad = n_fft - win_length
        frames = jnp.pad(
            frames, [(0, 0)] * (frames.ndim - 1) + [(pad // 2, pad - pad // 2)]
        )
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec)


def log_mel_spectrogram(x, sample_rate: int, n_fft: int, hop_length: int,
                        win_length: int, n_mels: int, fmin: float = 0.0,
                        fmax: float | None = None, eps: float = 1e-10):
    """log10 mel power spectrogram of (..., T) -> (..., n_frames, n_mels)."""
    mag = stft_magnitude(x, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.maximum(mag ** 2 @ fb, eps)
    return jnp.log10(mel)


def log_mel_spectrogram_np(x: np.ndarray, sample_rate: int, n_fft: int,
                           hop_length: int, win_length: int, n_mels: int,
                           fmin: float = 0.0, fmax: float | None = None,
                           eps: float = 1e-10) -> np.ndarray:
    """Pure-numpy mirror of log_mel_spectrogram for pooled CPU workers
    (no jax import — spawn-cheap; parity-tested against the jnp path)."""
    pad = win_length // 2
    xp = np.pad(np.asarray(x, np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - win_length) // hop_length
    starts = np.arange(n_frames) * hop_length
    frames = xp[starts[:, None] + np.arange(win_length)[None, :]]
    frames = frames * np.hanning(win_length + 1)[:-1].astype(np.float32)
    if win_length < n_fft:
        extra = n_fft - win_length
        frames = np.pad(frames, ((0, 0), (extra // 2, extra - extra // 2)))
    mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    return np.log10(np.maximum(mag.astype(np.float32) ** 2 @ fb, eps))
