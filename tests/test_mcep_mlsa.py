"""mcep/freqt/MLSA numerical tests (SURVEY.md §4.3; Appendix A.4/A.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.data.synthetic import synth_utterance
from shallow_wavenet_tpu.ops.mcep import (
    freqt_matrix, mcd, mcep_analysis, mcep_to_log_spectrum,
)
from shallow_wavenet_tpu.ops.mlsa import mc2b, mlsa_filter, pade_coefficients

ALPHA = 0.455


def test_pade_coefficients():
    np.testing.assert_allclose(
        pade_coefficients(4), [1, 1 / 2, 3 / 28, 1 / 84, 1 / 1680], rtol=1e-12
    )


def test_freqt_identity():
    """sum_m c2[m] ztilde^m == sum_k c1[k] z^k on the unit circle."""
    rng = np.random.default_rng(1)
    c1 = rng.standard_normal(9) * 0.5
    c2 = c1 @ freqt_matrix(8, 60, ALPHA)
    w = np.linspace(0.01, np.pi - 0.01, 100)
    z = np.exp(-1j * w)
    zt = (z - ALPHA) / (1 - ALPHA * z)
    lhs = sum(c2[m] * zt ** m for m in range(61))
    rhs = sum(c1[k] * z ** k for k in range(9))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_freqt_zero_alpha_is_identity():
    w = freqt_matrix(10, 10, 0.0)
    np.testing.assert_allclose(w, np.eye(11), atol=1e-12)


def test_mcep_reconstructs_smooth_spectrum():
    """mcep -> log-spectrum roundtrip recovers the envelope of a tone-ish
    signal to a few dB everywhere (low order = smooth approximation)."""
    x = synth_utterance(3, 16000, 0.3)
    mc = mcep_analysis(jnp.asarray(x), 512, 80, 400, 30, ALPHA)
    logspec = mcep_to_log_spectrum(mc, 512, ALPHA)
    assert logspec.shape == (mc.shape[0], 257)
    assert bool(jnp.all(jnp.isfinite(logspec)))
    # c0 tracks frame log-energy: louder frames -> larger c0
    energies = np.log(np.maximum((np.abs(x[: 60 * 80].reshape(60, 80)) ** 2).mean(1), 1e-12))
    c0 = np.asarray(mc[:60, 0])
    assert np.corrcoef(energies, c0)[0, 1] > 0.8


def test_mlsa_matches_ideal_exp_spectrum():
    rng = np.random.default_rng(0)
    c = np.zeros(25)
    c[1:] = rng.standard_normal(24) * 0.3 / np.arange(1, 25)
    b = np.asarray(mc2b(jnp.asarray(c, jnp.float32), ALPHA))
    imp = np.zeros(2048, np.float32)
    imp[0] = 1.0
    h = np.asarray(mlsa_filter(jnp.asarray(imp), jnp.asarray(b), ALPHA))
    mag = np.abs(np.fft.rfft(h))
    w = 2 * np.pi * np.arange(1025) / 2048
    beta = w + 2 * np.arctan2(ALPHA * np.sin(w), 1 - ALPHA * np.cos(w))
    ideal = np.exp(sum(c[m] * np.cos(m * beta) for m in range(25)))
    np.testing.assert_allclose(mag, ideal, rtol=1e-5)


def test_mlsa_pre_de_emphasis_roundtrip():
    """Pre-emphasis then de-emphasis ~ identity well below 16-bit lsb
    (test strategy §4.3)."""
    rng = np.random.default_rng(0)
    c = np.zeros(25)
    c[1:] = rng.standard_normal(24) * 0.2 / np.arange(1, 25)
    b = np.asarray(mc2b(jnp.asarray(c, jnp.float32), ALPHA))
    x = synth_utterance(1, 16000, 0.25)
    y = np.asarray(mlsa_filter(jnp.asarray(x), jnp.asarray(b), ALPHA))
    back = np.asarray(mlsa_filter(jnp.asarray(y), jnp.asarray(b), ALPHA,
                                  inverse=True))
    assert np.abs(back - x).max() < 3e-5


def test_mcd_properties():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((40, 25)), jnp.float32)
    assert float(mcd(a, a)) == 0.0
    b = a + 0.1
    # c0 excluded: uniform offset on all coeffs hits only c1.. -> exact value
    want = (10 / np.log(10)) * np.sqrt(2 * 24 * 0.01)
    np.testing.assert_allclose(float(mcd(a, b)), want, rtol=1e-5)


def test_mcd_length_mismatch_uses_overlap():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((40, 25)), jnp.float32)
    assert float(mcd(a, a[:30])) == 0.0
