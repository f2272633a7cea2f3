"""Native C++ feature extraction == JAX ops (components C12/C13 native
surface; SURVEY.md §2.3 — the reference ran WORLD/SPTK (C/C++) inside a
per-utterance worker pool, SURVEY.md §3.2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shallow_wavenet_tpu.ops.f0 import band_aperiodicity, estimate_f0
from shallow_wavenet_tpu.ops.mcep import mcep_analysis
from shallow_wavenet_tpu.utils import native as nat

pytestmark = pytest.mark.skipif(
    not nat.native_available(), reason="native toolchain unavailable"
)

SR, HOP = 16000, 80


@pytest.fixture(scope="module")
def wav():
    """Harmonic sweep with an unvoiced noise head — exercises both the
    voiced F0 track and the vuv gate."""
    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    f0 = 150 + 40 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    x = sum((0.4 / k) * np.sin(k * phase) for k in range(1, 5))
    x += 0.01 * rng.standard_normal(x.size)
    head = int(0.2 * SR)
    x[:head] = 0.01 * rng.standard_normal(head)
    return (x / np.abs(x).max() * 0.8).astype(np.float32)


def test_f0_native_matches_jax(wav):
    f0_j, vuv_j = map(np.asarray, estimate_f0(jnp.asarray(wav), SR, HOP))
    f0_n, vuv_n = nat.f0_native(wav, SR, HOP)
    assert f0_n.shape == f0_j.shape
    # the native path runs double precision vs the JAX fp32 pipeline, so
    # borderline frames may flip the voicing gate — cap the flip fraction
    assert np.mean(vuv_j != vuv_n) < 0.02
    both = (vuv_j > 0) & (vuv_n > 0)
    assert both.sum() > 50
    np.testing.assert_allclose(f0_n[both], f0_j[both], rtol=1e-4)


def test_mcep_native_matches_jax(wav):
    args = (1024, HOP, 1024, 24, 0.455)
    mc_j = np.asarray(mcep_analysis(jnp.asarray(wav), *args))
    mc_n = nat.mcep_native(wav, *args)
    assert mc_n.shape == mc_j.shape
    np.testing.assert_allclose(mc_n, mc_j, atol=1e-4)


def test_mcep_native_smoothed_matches_jax(wav):
    """The F0-adaptive lag-window envelope smoothing (C12, VERDICT r2
    item 7) must agree between the native worker path and the JAX path."""
    args = (1024, HOP, 1024, 24, 0.455)
    f0_n, vuv_n = nat.f0_native(wav, SR, HOP)
    f0v = (f0_n * vuv_n).astype(np.float32)
    mc_j = np.asarray(mcep_analysis(jnp.asarray(wav), *args,
                                    f0_hz=jnp.asarray(f0v), sample_rate=SR))
    mc_n = nat.mcep_native(wav, *args, f0=f0v, sample_rate=SR)
    assert mc_n.shape == mc_j.shape
    np.testing.assert_allclose(mc_n, mc_j, atol=1e-4)
    # and it genuinely changed the envelope (the lifter did something)
    plain = nat.mcep_native(wav, *args)
    assert np.abs(mc_n - plain).max() > 1e-3


def test_bap_native_matches_jax(wav):
    f0_n, _ = nat.f0_native(wav, SR, HOP)
    bap_j = np.asarray(
        band_aperiodicity(jnp.asarray(wav), jnp.asarray(f0_n), SR, HOP,
                          n_bands=4))
    bap_n = nat.band_aperiodicity_native(wav, f0_n, SR, HOP, n_bands=4)
    n = min(bap_j.shape[0], bap_n.shape[0])
    np.testing.assert_allclose(bap_n[:n], bap_j[:n], atol=1e-4)


def test_world_features_native_matches_extract_one(wav, tmp_path):
    """The pooled-worker world path (numpy_only=True -> native lib) must
    emit the same feature matrix as the single-process JAX path."""
    from shallow_wavenet_tpu.bin.feature_extract import extract_one
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.data.audio_io import write_wav

    cfg = get_config("shallow_laplace_ns", [
        "data.feature_type=world", f"data.sample_rate={SR}",
        "data.highpass_cutoff=0",
    ])
    wp = tmp_path / "utt.wav"
    write_wav(str(wp), wav, SR)
    feats_jax = extract_one(str(wp), cfg, numpy_only=False)
    feats_nat = extract_one(str(wp), cfg, numpy_only=True)
    assert feats_nat.shape == feats_jax.shape
    # column 1 is the {0,1} voicing gate: compare as flip fraction; the
    # rest (lf0 / mcep / bap) must track numerically. lf0 columns where the
    # gates disagree differ by the whole log-f0 value, so mask those frames.
    agree = feats_nat[:, 1] == feats_jax[:, 1]
    assert np.mean(~agree) < 0.02
    np.testing.assert_allclose(feats_nat[agree], feats_jax[agree],
                               atol=2e-4)


def test_energy_feature_parity_and_floor(tmp_path):
    """data.energy_feature appends the frame log-RMS channel (ops/energy.py)
    on BOTH extraction paths bit-identically, grows feature_dim by 1, and
    maps digital-zero frames to the exact log(ENERGY_FLOOR) constant — the
    explicit silence cue of the r5 deep preset (BASELINE.md r4 hiss
    diagnosis)."""
    import math

    from shallow_wavenet_tpu.bin.feature_extract import extract_one
    from shallow_wavenet_tpu.config import feature_dim, get_config
    from shallow_wavenet_tpu.data.audio_io import write_wav
    from shallow_wavenet_tpu.data.synthetic import synth_utterance_speechlike
    from shallow_wavenet_tpu.ops.energy import ENERGY_FLOOR

    cfg = get_config("shallow_laplace_ns", [
        "data.feature_type=world", f"data.sample_rate={SR}",
        "data.highpass_cutoff=0", "data.energy_feature=true",
        "model.aux_channels=32",
    ])
    assert feature_dim(cfg) == 32
    w, _, _ = synth_utterance_speechlike(7, SR, 1.0)  # has true silence
    wp = tmp_path / "utt.wav"
    write_wav(str(wp), w, SR)
    feats_jax = extract_one(str(wp), cfg, numpy_only=False)
    feats_nat = extract_one(str(wp), cfg, numpy_only=True)
    assert feats_jax.shape[1] == 32 == feats_nat.shape[1]
    np.testing.assert_array_equal(feats_jax[:, -1], feats_nat[:, -1])
    floor = np.float32(math.log(ENERGY_FLOOR))
    assert (feats_jax[:, -1] == floor).any()          # silent frames
    assert (feats_jax[:, -1] > floor + 1.0).any()     # voiced frames

    # the mel path gets the same channel
    cfg_mel = get_config("shallow_laplace_ns", [
        f"data.sample_rate={SR}", "data.highpass_cutoff=0",
        "data.energy_feature=true", "model.aux_channels=81",
    ])
    assert feature_dim(cfg_mel) == 81
    f_mel = extract_one(str(wp), cfg_mel, numpy_only=False)
    assert f_mel.shape[1] == 81
    np.testing.assert_array_equal(f_mel[:, -1], feats_jax[:, -1])


def test_energy_frame_centering():
    """frame_log_energy frames are CENTERED at i*hop like every other
    analyzer (stft/mcep/f0, center=True) — the original hop-partition
    framing led the conditioning by hop/2 and measurably regressed the
    r5 deep run (1.5 dB MCD, VUV errors at voiced transitions; see
    ops/energy.py). A burst placed just BEFORE sample i*hop must land in
    frame i (centered window [i*hop - hop/2, i*hop + hop/2)), where the
    partition framing would put it in frame i-1."""
    import math

    from shallow_wavenet_tpu.ops.energy import ENERGY_FLOOR, frame_log_energy

    hop = 320
    wav = np.zeros(10 * hop, np.float32)
    wav[5 * hop - 100:5 * hop - 50] = 1.0
    e = frame_log_energy(wav, hop)[:, 0]
    assert e.shape == (10,)
    assert int(np.argmax(e)) == 5
    floor = np.float32(math.log(ENERGY_FLOOR))
    # frames whose centered window lies fully in digital silence read the
    # exact floor constant (the silence sentinel the model conditions on)
    assert np.all(e[7:] == floor)
    assert np.all(e[:4] == floor)
    # edge frames: first/last windows are edge-padded, never out-of-bounds
    wav2 = np.ones(4 * hop, np.float32)
    e2 = frame_log_energy(wav2, hop)[:, 0]
    assert np.allclose(e2, 0.0, atol=1e-6)   # log RMS of all-ones = 0


def test_f0_native_matches_jax_on_stressed_signal():
    """The octave-guard + continuity-repair paths must also agree: a
    high-passed speech-like signal (missing fundamental) drives both
    twins through the guard branches (VERDICT r1 item 5)."""
    from shallow_wavenet_tpu.data.synthetic import synth_utterance_speechlike
    from shallow_wavenet_tpu.ops.filters import highpass

    wav, _, _ = synth_utterance_speechlike(1, SR, 2.0)
    wav = np.asarray(highpass(wav, SR, 400.0), np.float32)
    f0_j, vuv_j = map(np.asarray, estimate_f0(jnp.asarray(wav), SR, HOP))
    f0_n, vuv_n = nat.f0_native(wav, SR, HOP)
    assert np.mean(vuv_j != vuv_n) < 0.02
    both = (vuv_j > 0) & (vuv_n > 0)
    assert both.sum() > 50
    np.testing.assert_allclose(f0_n[both], f0_j[both], rtol=1e-3)
