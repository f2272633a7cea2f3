"""WORLD-equivalent analysis-synthesis vocoder (the synthesis half of
component C12; reference family: pyworld.synthesize fed by the
WORLD/SPTK feature chain — SURVEY.md §2.3).

Source-filter synthesis from the `world` conditioning feature set
(log-F0 + vuv + mcep + band aperiodicity, bin/feature_extract):

  excitation  = mixed pulse train (voiced) / white noise, aperiodicity-
                weighted; pulse amplitude sqrt(sr/f0) so a pulse train at
                any F0 has unit expected power per sample
  spectrum    = exp(mel log envelope) realized by the time-varying MLSA
                filter (ops/mlsa.mlsa_filter_tv) on the frame-rate mcep

Two uses:
- the ANALYSIS-SYNTHESIS ORACLE: synth from true features gives the MCD
  floor of the feature chain + metric on a corpus, independent of any
  neural model (VERDICT r2 item 5 — anchors corpus-difficulty numbers);
- a classical fallback vocoder for the world feature set.

Simplification vs WORLD's synthesis: aperiodicity mixes the noise/pulse
balance per FRAME (mean over bands), not per spectral band — the band
filterbank split is not worth its cost for the oracle role.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shallow_wavenet_tpu.ops.mlsa import mc2b, mlsa_filter_tv


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "hop", "t_len"))
def excitation(f0, vuv, ap, key, sample_rate: int, hop: int, t_len: int = 0):
    """Mixed excitation (T,) from frame tracks f0/vuv/ap (n_frames,).

    Voiced: pulse train by phase accumulation (a pulse where the running
    phase sum(f0/sr) crosses an integer), amplitude sqrt(sr/f0) scaled by
    sqrt(1-ap); plus white noise scaled by sqrt(ap). Unvoiced: pure unit
    noise. Phase accumulates across voicing boundaries so consecutive
    voiced regions stay coherent.
    """
    t_len = t_len or f0.shape[0] * hop
    rep = lambda a: jnp.repeat(a, hop)[:t_len]                  # noqa: E731
    f0_t = rep(jnp.asarray(f0, jnp.float32))
    vuv_t = rep(jnp.asarray(vuv, jnp.float32))
    ap_t = jnp.clip(rep(jnp.asarray(ap, jnp.float32)), 0.0, 1.0)
    inc = jnp.where(vuv_t > 0, jnp.maximum(f0_t, 1.0), 0.0) / sample_rate
    phase = jnp.cumsum(inc)
    # pulse at every integer crossing of the accumulated phase
    crossings = jnp.floor(phase) - jnp.floor(
        jnp.concatenate([jnp.zeros((1,)), phase[:-1]]))
    amp = jnp.sqrt(sample_rate / jnp.maximum(f0_t, 1.0))
    pulses = crossings * amp
    noise = jax.random.normal(key, (t_len,), jnp.float32)
    voiced = jnp.sqrt(jnp.maximum(1.0 - ap_t, 0.0)) * pulses \
        + jnp.sqrt(ap_t) * noise
    return jnp.where(vuv_t > 0, voiced, noise)


def world_synthesis(feats, key, sample_rate: int, hop: int,
                    mcep_order: int, alpha: float, t_len: int = 0):
    """Synthesize a waveform from one utterance's `world` feature matrix
    (n_frames, 2 + mcep_order+1 + n_bap) as written by feature_extract:
    columns [log-F0 | vuv | mcep.. | bap..]. Features must be
    UN-normalized. Returns (T,) float32 in [-1, 1]."""
    feats = jnp.asarray(feats, jnp.float32)
    lf0, vuv = feats[:, 0], feats[:, 1]
    mc = feats[:, 2:2 + mcep_order + 1]
    bap = feats[:, 2 + mcep_order + 1:]
    f0 = jnp.where(vuv > 0.5, jnp.exp(lf0), 0.0)
    ap = bap.mean(axis=-1) if bap.shape[-1] else jnp.zeros_like(lf0)
    exc = excitation(f0, vuv, ap, key, sample_rate, hop, t_len)
    b = mc2b(mc, alpha)
    y = mlsa_filter_tv(exc, b, alpha, hop)
    return jnp.clip(y, -1.0, 1.0)
