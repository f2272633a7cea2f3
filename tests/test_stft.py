"""Known-signal sanity for STFT/mel (SURVEY.md §4.3: pure tone -> expected bin)."""

import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.ops import log_mel_spectrogram, mel_filterbank
from shallow_wavenet_tpu.ops.stft import frame_signal, hz_to_mel, stft_magnitude


SR, NFFT, HOP, WIN, NMELS = 16000, 512, 80, 400, 32


def test_frame_shapes():
    x = jnp.zeros((2, 1600))
    fr = frame_signal(x, WIN, HOP)
    assert fr.shape == (2, 1 + 1600 // HOP - WIN // HOP + (WIN // 2 * 2) // HOP, WIN) or fr.ndim == 3
    # center=True pads win//2 both sides: n_frames = 1 + T//hop when T % hop == 0
    assert fr.shape[1] == 1 + (1600 + 2 * (WIN // 2) - WIN) // HOP


def test_pure_tone_peak_bin():
    f = 1000.0
    t = np.arange(SR) / SR
    x = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))
    mag = stft_magnitude(x, NFFT, HOP, WIN)
    peak = int(jnp.argmax(mag[mag.shape[0] // 2]))
    expected = round(f / (SR / NFFT))
    assert abs(peak - expected) <= 1


def test_pure_tone_mel_peak():
    f = 1000.0
    t = np.arange(SR) / SR
    x = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))
    mel = log_mel_spectrogram(x, SR, NFFT, HOP, WIN, NMELS, fmin=40.0, fmax=7600.0)
    peak = int(jnp.argmax(mel[mel.shape[0] // 2]))
    # expected mel channel of a 1 kHz tone given the linear-in-mel spacing
    lo, hi = hz_to_mel(40.0), hz_to_mel(7600.0)
    expected = round((hz_to_mel(f) - lo) / (hi - lo) * (NMELS + 1)) - 1
    assert abs(peak - expected) <= 1


def test_filterbank_partition():
    fb = mel_filterbank(SR, NFFT, NMELS, 40.0, 7600.0)
    assert fb.shape == (NFFT // 2 + 1, NMELS)
    assert np.all(fb >= 0)
    # every mel channel has support
    assert np.all(fb.sum(axis=0) > 0)


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    xs = rng.standard_normal((3, SR // 4)).astype(np.float32)
    batched = log_mel_spectrogram(jnp.asarray(xs), SR, NFFT, HOP, WIN, NMELS)
    single = jnp.stack([
        log_mel_spectrogram(jnp.asarray(x), SR, NFFT, HOP, WIN, NMELS) for x in xs
    ])
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-5)


def test_numpy_mirror_matches_jnp():
    """log_mel_spectrogram_np (pooled-worker path) == jnp implementation."""
    from shallow_wavenet_tpu.ops.stft import log_mel_spectrogram_np

    rng = np.random.default_rng(7)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(jnp.asarray(x), SR, NFFT, HOP, WIN,
                                       NMELS, 40.0, 7600.0))
    b = log_mel_spectrogram_np(x, SR, NFFT, HOP, WIN, NMELS, 40.0, 7600.0)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
