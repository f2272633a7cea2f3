"""WORLD-equivalent analysis-synthesis vocoder (component C12's synthesis
half; ops/synthesis.py + the time-varying MLSA of ops/mlsa.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shallow_wavenet_tpu.ops.synthesis import excitation, world_synthesis

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
    syn = np.asarray(world_synthesis(feats, jax.random.key(0), SR, HOP,
                                     cfg.noise_shaping.mcep_order,
                                     cfg.noise_shaping.alpha,
                                     t_len=len(wav)))
    assert syn.shape == wav.shape and np.isfinite(syn).all()
    assert np.abs(syn).max() <= 1.0
    m = eval_pair(wav, syn, cfg)
    assert m["mcd_db"] < 6.0, m
