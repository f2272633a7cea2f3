"""WORLD-equivalent analysis-synthesis vocoder (component C12's synthesis
half; ops/synthesis.py + the time-varying MLSA of ops/mlsa.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shallow_wavenet_tpu.ops.synthesis import (
    excitation, excitation_multiband, world_synthesis,
)

SR, HOP = 16000, 80


def test_excitation_pulse_rate_tracks_f0():
    n = 100
    f0 = np.full(n, 200.0, np.float32)
    vuv = np.ones(n, np.float32)
    ap = np.zeros(n, np.float32)
    e = np.asarray(excitation(jnp.asarray(f0), jnp.asarray(vuv),
                              jnp.asarray(ap), jax.random.key(0), SR, HOP))
    assert e.shape == (n * HOP,)
    # pure pulse train at 200 Hz over 0.5 s -> ~100 pulses
    n_pulses = int((e != 0).sum())
    assert 95 <= n_pulses <= 105, n_pulses
    # amplitude normalization: expected power per sample ~ 1
    assert 0.5 < float((e ** 2).mean()) < 2.0


def test_excitation_unvoiced_is_noise():
    n = 50
    e = np.asarray(excitation(jnp.zeros(n), jnp.zeros(n), jnp.ones(n),
                              jax.random.key(1), SR, HOP))
    assert np.abs(np.mean(e)) < 0.1 and 0.8 < np.std(e) < 1.2


def test_excitation_tlen_past_frame_cover():
    """t_len > n_frames*hop (real utterance lengths are not hop
    multiples) must edge-pad the frame tracks, not crash (ADVICE r3
    medium)."""
    n = 20
    f0 = np.full(n, 150.0, np.float32)
    vuv = np.ones(n, np.float32)
    t_len = n * HOP + 37
    e = np.asarray(excitation(jnp.asarray(f0), jnp.asarray(vuv),
                              jnp.zeros(n), jax.random.key(0), SR, HOP,
                              t_len=t_len))
    assert e.shape == (t_len,) and np.isfinite(e).all()
    bap = np.full((n, 4), 0.3, np.float32)
    em = np.asarray(excitation_multiband(
        jnp.asarray(f0), jnp.asarray(vuv), jnp.asarray(bap),
        jax.random.key(0), SR, HOP, t_len=t_len))
    assert em.shape == (t_len,) and np.isfinite(em).all()


def test_multiband_uniform_ap_matches_per_frame():
    """With every band carrying the SAME aperiodicity, the band masks sum
    to identity and the multiband mix must telescope to the per-frame
    formula (voiced region; the well-posedness invariant of the A/B)."""
    n = 40
    f0 = np.full(n, 180.0, np.float32)
    vuv = np.ones(n, np.float32)
    ap = np.full(n, 0.4, np.float32)
    bap = np.repeat(ap[:, None], 4, axis=1)
    key = jax.random.key(3)
    e1 = np.asarray(excitation(jnp.asarray(f0), jnp.asarray(vuv),
                               jnp.asarray(ap), key, SR, HOP))
    e2 = np.asarray(excitation_multiband(
        jnp.asarray(f0), jnp.asarray(vuv), jnp.asarray(bap), key, SR, HOP))
    np.testing.assert_allclose(e1, e2, atol=2e-4)


def test_multiband_band_selective_mixing():
    """ap = 1 in the top band only, 0 elsewhere: the excitation's top
    quarter of the spectrum must be noise-dominated while the lower bands
    stay pulse-dominated (spectral flatness as the discriminator)."""
    n = 60
    f0 = np.full(n, 120.0, np.float32)
    vuv = np.ones(n, np.float32)
    bap = np.zeros((n, 4), np.float32)
    bap[:, 3] = 1.0
    e = np.asarray(excitation_multiband(
        jnp.asarray(f0), jnp.asarray(vuv), jnp.asarray(bap),
        jax.random.key(7), SR, HOP))
    spec = np.abs(np.fft.rfft(e)) ** 2
    nb = len(spec) // 4

    def flatness(p):
        p = np.maximum(p, 1e-12)
        return float(np.exp(np.mean(np.log(p))) / np.mean(p))

    # harmonic (pulse) band: spiky spectrum -> low flatness; noise band:
    # flat spectrum -> high flatness
    assert flatness(spec[:nb]) < 0.3 < flatness(spec[3 * nb:]), (
        flatness(spec[:nb]), flatness(spec[3 * nb:]))


def test_world_synthesis_roundtrip_quality():
    """Analysis-synthesis on a harmonic utterance must land well below the
    random-signal MCD regime (~13 dB) — the oracle floor this synthesizer
    exists to measure (tools/as_oracle.py; measured ~3 dB corpus mean)."""
    from shallow_wavenet_tpu.bin.mcd_eval import eval_pair
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.data.synthetic import synth_utterance
    from shallow_wavenet_tpu.ops.f0 import estimate_f0, log_f0
    from shallow_wavenet_tpu.ops.mcep import mcep_analysis

    cfg = get_config("shallow_laplace_ns", [
        "data.feature_type=world", "model.aux_channels=31",
        f"data.sample_rate={SR}"])
    wav = synth_utterance(7, SR, 1.0)
    x = jnp.asarray(wav)
    f0, vuv = estimate_f0(x, SR, HOP, f0_min=cfg.data.f0_min,
                          f0_max=cfg.data.f0_max)
    mc = mcep_analysis(x, cfg.data.n_fft, HOP, cfg.data.win_length,
                       cfg.noise_shaping.mcep_order, cfg.noise_shaping.alpha)
    from shallow_wavenet_tpu.ops.f0 import band_aperiodicity

    bap = band_aperiodicity(x, f0, SR, HOP, n_bands=cfg.data.n_bap)
    n = min(f0.shape[0], mc.shape[0], bap.shape[0], len(wav) // HOP)
    feats = jnp.concatenate(
        [log_f0(f0, vuv)[:n, None], vuv[:n, None], mc[:n], bap[:n]], axis=-1)
    # per-frame mix: the MCD-floor-oriented path (tools/as_oracle.py's
    # pb=0 / det rows); per-band: the WORLD-faithful default, which pays
    # a structural MCD penalty wherever it mixes noise (the filter
    # already tracks the measured envelope — see ops/synthesis.py)
    for per_band, thresh in ((False, 6.0), (True, 8.5)):
        syn = np.asarray(world_synthesis(feats, jax.random.key(0), SR, HOP,
                                         cfg.noise_shaping.mcep_order,
                                         cfg.noise_shaping.alpha,
                                         t_len=len(wav), per_band=per_band))
        assert syn.shape == wav.shape and np.isfinite(syn).all()
        assert np.abs(syn).max() <= 1.0
        m = eval_pair(wav, syn, cfg)
        assert m["mcd_db"] < thresh, (per_band, m)
