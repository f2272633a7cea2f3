"""F0 / aperiodicity tests (component C12; SURVEY.md §4.3 known-signal)."""

import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.data.synthetic import synth_utterance
from shallow_wavenet_tpu.ops.f0 import (
    band_aperiodicity, estimate_f0, log_f0,
)

SR, HOP = 16000, 80


def tone(freq, dur=0.5, sr=SR):
    t = np.arange(int(sr * dur)) / sr
    return jnp.asarray(0.5 * np.sin(2 * np.pi * freq * t), jnp.float32)


def test_pure_tone_f0():
    for freq in (110.0, 220.0, 330.0):
        f0, vuv = estimate_f0(tone(freq), SR, HOP)
        mid = slice(f0.shape[0] // 4, 3 * f0.shape[0] // 4)
        assert float(np.mean(np.asarray(vuv)[mid])) > 0.9
        voiced = np.asarray(f0)[mid]
        voiced = voiced[voiced > 0]
        assert abs(np.median(voiced) - freq) < 0.02 * freq, (
            freq, np.median(voiced))


def test_noise_is_unvoiced():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR // 2).astype(np.float32) * 0.3)
    f0, vuv = estimate_f0(x, SR, HOP)
    assert float(np.mean(np.asarray(vuv))) < 0.2


def test_silence_is_unvoiced():
    f0, vuv = estimate_f0(jnp.zeros(SR // 2), SR, HOP)
    assert float(np.asarray(vuv).max()) == 0.0
    assert float(np.asarray(f0).max()) == 0.0


def test_synthetic_speech_f0_in_range():
    x = jnp.asarray(synth_utterance(0, SR, 0.5))
    f0, vuv = estimate_f0(x, SR, HOP)
    voiced = np.asarray(f0)[np.asarray(vuv) > 0]
    assert voiced.size > 10
    assert np.all(voiced >= 70.0) and np.all(voiced <= 400.0)


def test_band_aperiodicity_shape_and_range():
    x = tone(200.0)
    f0, vuv = estimate_f0(x, SR, HOP)
    bap = band_aperiodicity(x, f0, SR, HOP, n_bands=4)
    assert bap.shape[-1] == 4
    b = np.asarray(bap)
    assert np.all(b >= 0) and np.all(b <= 1)
    # a pure tone in band 0 is highly periodic there
    mid = slice(b.shape[0] // 4, 3 * b.shape[0] // 4)
    assert float(np.median(b[mid, 0])) < 0.35


def test_log_f0_encoding():
    f0 = jnp.asarray([0.0, 100.0, 200.0])
    vuv = jnp.asarray([0.0, 1.0, 1.0])
    lf = np.asarray(log_f0(f0, vuv))
    assert lf[0] == 0.0
    np.testing.assert_allclose(lf[1], np.log(100.0), rtol=1e-6)


def test_world_feature_extraction_end_to_end(tmp_path):
    from shallow_wavenet_tpu.bin.feature_extract import extract_one
    from shallow_wavenet_tpu.config import feature_dim, get_config
    from shallow_wavenet_tpu.data.audio_io import write_wav

    cfg = get_config("shallow_softmax_single",
                     ["data.feature_type=world", "noise_shaping.mcep_order=24"])
    x = synth_utterance(1, cfg.data.sample_rate, 0.4)
    p = tmp_path / "a.wav"
    write_wav(p, x, cfg.data.sample_rate)
    feats = extract_one(str(p), cfg)
    assert feats.shape[1] == feature_dim(cfg) == 2 + 25 + 4
    assert np.all(np.isfinite(feats))
