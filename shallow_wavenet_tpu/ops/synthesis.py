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

Aperiodicity mixing is PER BAND (WORLD's multiband convention): the pulse
train and the noise are split into the same n_bap linear frequency bands
the analyzer measures (ops/f0.band_aperiodicity — equal bin splits of
[0, Nyquist]), and each band mixes sqrt(1-ap_b)*pulse_b + sqrt(ap_b)*
noise_b with its own frame track. When every band carries the same ap the
sum telescopes to the per-frame formula (the complementary band masks sum
to identity), so per_band=False remains an exact special case and the A/B
is well-posed (VERDICT r3 item 3; the round-3 per-frame mean was the last
C12 simplification)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shallow_wavenet_tpu.ops.mlsa import mc2b, mlsa_filter_tv


def _rep_tracks(hop: int, t_len: int):
    """Frame-rate -> sample-rate expander: repeat each frame hop times,
    EDGE-pad when the wav outruns n_frames*hop (wav length not a multiple
    of hop — real utterances; ADVICE r3 medium), truncate to t_len."""
    def rep(a):
        r = jnp.repeat(a, hop, axis=0)
        if r.shape[0] < t_len:
            pad = [(0, t_len - r.shape[0])] + [(0, 0)] * (r.ndim - 1)
            r = jnp.pad(r, pad, mode="edge")
        return r[:t_len]
    return rep


def _pulse_train(f0_t, vuv_t, sample_rate: int):
    """Unit-power pulse train from sample-rate f0/vuv tracks by phase
    accumulation (a pulse where the running phase sum(f0/sr) crosses an
    integer). Phase accumulates across voicing boundaries so consecutive
    voiced regions stay coherent."""
    inc = jnp.where(vuv_t > 0, jnp.maximum(f0_t, 1.0), 0.0) / sample_rate
    phase = jnp.cumsum(inc)
    crossings = jnp.floor(phase) - jnp.floor(
        jnp.concatenate([jnp.zeros((1,)), phase[:-1]]))
    amp = jnp.sqrt(sample_rate / jnp.maximum(f0_t, 1.0))
    return crossings * amp


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "hop", "t_len"))
def excitation(f0, vuv, ap, key, sample_rate: int, hop: int, t_len: int = 0):
    """Mixed excitation (T,) from frame tracks f0/vuv/ap (n_frames,) with
    ONE aperiodicity track (per-frame mixing).

    Voiced: pulse train amplitude sqrt(sr/f0) scaled by sqrt(1-ap); plus
    white noise scaled by sqrt(ap). Unvoiced: pure unit noise.
    """
    t_len = t_len or f0.shape[0] * hop
    rep = _rep_tracks(hop, t_len)
    f0_t = rep(jnp.asarray(f0, jnp.float32))
    vuv_t = rep(jnp.asarray(vuv, jnp.float32))
    ap_t = jnp.clip(rep(jnp.asarray(ap, jnp.float32)), 0.0, 1.0)
    pulses = _pulse_train(f0_t, vuv_t, sample_rate)
    noise = jax.random.normal(key, (t_len,), jnp.float32)
    voiced = jnp.sqrt(jnp.maximum(1.0 - ap_t, 0.0)) * pulses \
        + jnp.sqrt(ap_t) * noise
    return jnp.where(vuv_t > 0, voiced, noise)


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "hop", "t_len"))
def excitation_multiband(f0, vuv, bap, key, sample_rate: int, hop: int,
                         t_len: int = 0):
    """Mixed excitation (T,) with PER-BAND aperiodicity mixing.

    bap is (n_frames, n_bands) — the analyzer's band tracks. The pulse
    train and noise are band-split by complementary rFFT masks over the
    same equal-width linear bands (zero-phase, utterance-length FFT) and
    each band mixes with its own sqrt(1-ap_b)/sqrt(ap_b) weights.
    Unvoiced frames carry ap_b = 1.0 from the analyzer, so the band sum
    reconstructs exactly the unit noise there — no voiced/unvoiced
    branch needed."""
    t_len = t_len or f0.shape[0] * hop
    n_bands = bap.shape[-1]
    rep = _rep_tracks(hop, t_len)
    f0_t = rep(jnp.asarray(f0, jnp.float32))
    vuv_t = rep(jnp.asarray(vuv, jnp.float32))
    bap_t = jnp.clip(rep(jnp.asarray(bap, jnp.float32)), 0.0, 1.0)
    # unvoiced frames must mix as pure noise even if the analyzer's bap
    # rows carry other values there
    bap_t = jnp.where(vuv_t[:, None] > 0, bap_t, 1.0)
    pulses = _pulse_train(f0_t, vuv_t, sample_rate)
    noise = jax.random.normal(key, (t_len,), jnp.float32)

    n_bins = t_len // 2 + 1
    pf = jnp.fft.rfft(pulses)
    nf = jnp.fft.rfft(noise)
    exc = jnp.zeros((t_len,), jnp.float32)
    # static unrolled band loop (n_bands ~ 4): equal BIN splits of
    # [0, Nyquist], matching ops/f0.band_aperiodicity's edges
    for b in range(n_bands):
        lo = (b * n_bins) // n_bands
        hi = ((b + 1) * n_bins) // n_bands
        mask = jnp.zeros((n_bins,), jnp.float32).at[lo:hi].set(1.0)
        p_b = jnp.fft.irfft(pf * mask, n=t_len)
        n_b = jnp.fft.irfft(nf * mask, n=t_len)
        ap_b = bap_t[:, b]
        exc = exc + jnp.sqrt(jnp.maximum(1.0 - ap_b, 0.0)) * p_b \
            + jnp.sqrt(ap_b) * n_b
    return exc


def world_synthesis(feats, key, sample_rate: int, hop: int,
                    mcep_order: int, alpha: float, t_len: int = 0,
                    per_band: bool = True, n_bap: int = 0,
                    peak_norm: bool = False):
    """Synthesize a waveform from one utterance's `world` feature matrix
    (n_frames, 2 + mcep_order+1 + n_bap) as written by feature_extract:
    columns [log-F0 | vuv | mcep.. | bap..]. Features must be
    UN-normalized. Pass n_bap explicitly when the matrix carries trailing
    extra channels (data.energy_feature); 0 = every remaining column is
    bap. Returns (T,) float32 in [-1, 1].

    peak_norm: the phase-coherent pulse excitation has a much higher crest
    factor than the natural waveform it re-synthesizes, so a loud low-F0
    utterance can overshoot [-1, 1] on a large fraction of samples; the
    default hard clip then shears the pulses off and the resynthesized
    PITCH itself becomes unmeasurable (measured: 41% clipped samples and
    octave-wrecked F0 on a 90 Hz utterance of the wide-F0 corpus). True
    rescales by the peak instead of clipping — distortion-free at a level
    offset, which MCD (m>=1 coefficients) ignores. Use for oracle/
    measurement synthesis (tools/pitch_eval.py); default stays clip so
    the dated oracle-floor baselines keep their exact definition."""
    feats = jnp.asarray(feats, jnp.float32)
    lf0, vuv = feats[:, 0], feats[:, 1]
    mc = feats[:, 2:2 + mcep_order + 1]
    b0 = 2 + mcep_order + 1
    bap = feats[:, b0:b0 + n_bap] if n_bap else feats[:, b0:]
    f0 = jnp.where(vuv > 0.5, jnp.exp(lf0), 0.0)
    if per_band and bap.shape[-1]:
        exc = excitation_multiband(f0, vuv, bap, key, sample_rate, hop,
                                   t_len)
    else:
        ap = bap.mean(axis=-1) if bap.shape[-1] else jnp.zeros_like(lf0)
        exc = excitation(f0, vuv, ap, key, sample_rate, hop, t_len)
    b = mc2b(mc, alpha)
    y = mlsa_filter_tv(exc, b, alpha, hop)
    if peak_norm:
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    return jnp.clip(y, -1.0, 1.0)
