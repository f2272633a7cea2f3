"""F0 / voicing / band-aperiodicity estimation — the TPU-native stand-in
for the reference's WORLD (C++) dependency (component C12, SURVEY.md §2.3;
flagged there as conditioning-optional, implemented for capability parity).

Method (vectorized over frames, FFT-based — XLA-friendly, no per-frame C
loops):
- F0: normalized autocorrelation via power spectrum -> IFFT (Wiener-
  Khinchin), peak search over the [f0_min, f0_max] lag range with parabolic
  interpolation; voicing = peak clarity above a threshold.
- Band aperiodicity: 1 - normalized band-limited autocorrelation peak at
  the chosen lag, per frequency band (a coarse D4C-style measure).

Frames are hop-aligned with the mel/mcep analyzers so all conditioning
streams line up frame-for-frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.ops.stft import frame_signal


def _norm_autocorr(frames, n_fft):
    """Biased normalized autocorrelation of windowed frames via rFFT."""
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, n=n_fft, axis=-1)
    return ac / jnp.maximum(ac[..., :1], 1e-12)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "hop_length", "win_length", "f0_min",
                     "f0_max", "threshold"),
)
def estimate_f0(x, sample_rate: int, hop_length: int, win_length: int = 0,
                f0_min: float = 70.0, f0_max: float = 400.0,
                threshold: float = 0.45):
    """(..., T) waveform -> (f0, vuv) each (..., n_frames).

    f0 is 0 where unvoiced; vuv is {0.,1.}. win_length defaults to
    2.5 * sample_rate / f0_min (rounded even) — at least 2 periods of the
    lowest pitch remain inside the window for every lag up to
    sample_rate / f0_min. Keep in sync with native/featext.cc and
    utils/native._f0_win (the pooled-worker twins).
    """
    if win_length == 0:
        win_length = int(2.5 * sample_rate / f0_min)
        win_length += win_length % 2
    lag_min = max(int(sample_rate / f0_max), 1)
    lag_max = int(np.ceil(sample_rate / f0_min))
    n_fft = int(2 ** np.ceil(np.log2(win_length + lag_max + 1)))

    frames = frame_signal(x, win_length, hop_length, center=True)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    win_np = np.hanning(win_length + 1)[:-1].astype(np.float32)
    win = jnp.asarray(win_np)
    ac = _norm_autocorr(frames * win, n_fft)
    # REFINEMENT happens on the window-de-biased values, which removes the
    # taper's slope at the peak (the ~2% low-F0 bias)
    wac = np.fft.irfft(np.abs(np.fft.rfft(win_np, n_fft)) ** 2, n_fft)
    wac = np.maximum((wac / wac[0]).astype(np.float32), 1e-3)
    ac_u = ac / jnp.asarray(wac)

    lags_u = ac_u[..., lag_min : lag_max + 1]
    span = lag_max - lag_min

    # peak SELECTION: YIN-style cumulative-mean-normalized difference
    # (CMND) of the DE-BIASED autocorrelation. Plain biased-argmax fails
    # two ways at the range edges: (a) the zero-lag shoulder leaks into
    # the search window when f0_max is high (lag_min small), so any smooth
    # frame "detects" a near-f0_max pitch; (b) the taper suppresses the
    # true peak of low-F0 frames (hann window autocorr is ~0.47 at
    # lag = win/3) below the shoulder values. Measured failure: a 60 Hz
    # harmonic frame under a 50-600 Hz range picked lag 26 (575 Hz,
    # biased 0.495) over the true lag 267 (biased 0.455, de-biased 0.967).
    # CMND's running-mean normalization cancels the shoulder exactly (its
    # cumulative mean is as large as the values themselves) while dips at
    # the true period stay deep. de Cheveigne & Kawahara 2002, eq. 8.
    d = jnp.maximum(1.0 - ac_u[..., 1 : lag_max + 1], 1e-6)
    tau = jnp.arange(1, lag_max + 1, dtype=jnp.float32)
    cmnd = d * tau / jnp.maximum(jnp.cumsum(d, axis=-1), 1e-9)
    cmnd_sl = cmnd[..., lag_min - 1 :]
    # YIN step 4, with a RELATIVE threshold: take the FIRST lag dipping
    # below max(0.2, 1.25 * the frame's global CMND min) and walk forward
    # to that dip's local minimum. First-dip, not global argmin: under
    # additive noise the global min drifts to a subharmonic multiple whose
    # dip is marginally deeper (measured: 4 exact octave-down frames at
    # 10 dB SNR). Local minimum, not the crossing itself: the dip's
    # shoulder sits several samples short of the true period (measured
    # +9% on pure tones). Relative, not fixed-absolute: noisy glide
    # frames have no dip under any fixed value, and the period dip is
    # within 1.25x of the subharmonic's whenever the latter only wins by
    # noise margin. Global argmin remains the no-dip fallback.
    theta = jnp.maximum(jnp.min(cmnd_sl, axis=-1, keepdims=True) * 1.25,
                        0.2)
    below = cmnd_sl < theta
    i0 = jnp.argmax(below, axis=-1)
    nondec = cmnd_sl[..., 1:] >= cmnd_sl[..., :-1]
    stop = jnp.concatenate(
        [nondec, jnp.ones_like(nondec[..., :1])], axis=-1)
    idx = jnp.arange(cmnd_sl.shape[-1])
    j_loc = jnp.argmax(stop & (idx >= i0[..., None]), axis=-1)
    k_sel = jnp.where(jnp.any(below, axis=-1), j_loc,
                      jnp.argmin(cmnd_sl, axis=-1))

    def refine(j0, window=3):
        """Re-maximize the de-biased values in a +-window around j0 (the
        taper shifts the biased peak a few samples short), then parabolic
        interpolation. Returns (j, value, fractional delta)."""
        offs = jnp.arange(-window, window + 1)
        widx = jnp.clip(j0[..., None] + offs, 0, span)
        wvals = jnp.take_along_axis(lags_u, widx, axis=-1)
        j = jnp.clip(j0 + (jnp.argmax(wvals, axis=-1) - window), 0, span)
        v = jnp.take_along_axis(lags_u, j[..., None], axis=-1)[..., 0]
        jm1 = jnp.take_along_axis(
            lags_u, jnp.maximum(j - 1, 0)[..., None], axis=-1)[..., 0]
        jp1 = jnp.take_along_axis(
            lags_u, jnp.minimum(j + 1, span)[..., None], axis=-1)[..., 0]
        denom = jm1 - 2 * v + jp1
        delta = jnp.where(jnp.abs(denom) > 1e-9,
                          0.5 * (jm1 - jp1) / denom, 0.0)
        return j, v, jnp.clip(delta, -0.5, 0.5)

    k, peak, delta = refine(k_sel)
    lag = lag_min + k.astype(jnp.float32) + delta
    # octave/subharmonic guard: the autocorrelation also peaks at integer
    # MULTIPLES of the true period, so the global max can land an octave
    # (or a twelfth) low. If the de-biased value at ~lag/m (m = 2, 3) is
    # nearly as high, the shorter lag is the true period — prefer it.
    for m in (2, 3):
        jc = jnp.round((lag_min + k) / m).astype(jnp.int32) - lag_min
        ok = jc >= 0
        jc_, vc, dc = refine(jnp.maximum(jc, 0), window=2)
        better = ok & (vc >= 0.9 * peak)
        lag_c = lag_min + jc_.astype(jnp.float32) + dc
        lag = jnp.where(better, lag_c, lag)
    f0 = sample_rate / jnp.maximum(lag, 1.0)

    # voicing: autocorrelation peak clarity + frame energy floor
    energy = jnp.mean((frames * win) ** 2, axis=-1)
    vuv = ((peak > threshold)
           & (energy > 1e-6)
           & (f0 >= f0_min) & (f0 <= f0_max)).astype(jnp.float32)
    f0 = _correct_outliers(f0, vuv)
    return f0 * vuv, vuv


def _correct_outliers(f0, vuv):
    """Temporal continuity repair: a voiced frame whose F0 deviates > 18%
    from the 5-frame voiced median (isolated octave flips, glide-boundary
    frames straddling a transition) is replaced BY that median; accurate
    frames pass through untouched, so fine accuracy is unchanged. Unvoiced
    neighbors are excluded from the median (substituted by the center
    value).

    Padding is REFLECT, not edge: edge padding lets frame 0 (or n-1)
    fill 3 of its own 5 window slots, so an octave error on an utterance
    that starts voiced self-confirms and survives the repair (measured on
    the formant corpus, seed 6: frame 0 read F0/2 at ratio 0.498 while
    frames 1.. were correct). Keep in sync with native/featext.cc."""
    n = f0.shape[-1]
    pad = [(0, 0)] * (f0.ndim - 1) + [(2, 2)]
    mode = "reflect" if n >= 3 else "edge"
    fpad = jnp.pad(f0, pad, mode=mode)
    vpad = jnp.pad(vuv, pad, mode=mode)
    idx = np.arange(n)[:, None] + np.arange(5)[None, :]
    w = fpad[..., idx]                      # (..., n, 5)
    wv = vpad[..., idx]
    center = f0[..., :, None]
    med = jnp.median(jnp.where(wv > 0, w, center), axis=-1)
    return jnp.where(jnp.abs(f0 - med) > 0.18 * med, med, f0)


# F0-adaptive window grid, shared with the native C++ twin
# (utils/native.band_aperiodicity_native) — keep in ONE place so a tuning
# change cannot silently break JAX-vs-native feature parity
BAP_F0_REFS = (70.0, 110.0, 170.0, 260.0)


def bap_window_length(sample_rate: int, f0_ref: float) -> int:
    """Shortest even window covering ~2.5 periods of f0_ref."""
    w = int(2.5 * sample_rate / f0_ref)
    return w + (w % 2)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "hop_length", "win_length", "n_bands"),
)
def band_aperiodicity(x, f0, sample_rate: int, hop_length: int,
                      win_length: int = 0, n_bands: int = 4):
    """Band aperiodicity (..., n_frames, n_bands) in [0, 1]:
    1 - normalized band-limited autocorrelation at the FRACTIONAL F0 lag
    (a D4C-style band-wise measure). 1.0 where unvoiced.

    Two D4C-style refinements over the round-3 coarse measure (VERDICT r3
    items 3/5):
    - FRACTIONAL lag: sampling the band autocorrelation at a ROUNDED lag
      is fine for low bands but a +-0.5-sample lag error rotates an 8 kHz
      component by up to pi — the integer-lag version reported ap ~0.9 in
      the top band of a PERFECTLY harmonic signal. ac(tau) is evaluated
      in the frequency domain at the exact lag.
    - F0-ADAPTIVE window (win_length=0, the default): a fixed 2.5-periods-
      of-70 Hz window spans ~7 periods at 200 Hz, so natural F0 movement
      (glides/vibrato) decorrelates high harmonics WITHIN the window and
      masquerades as aperiodicity. Each frame uses the shortest window
      covering ~2.5 periods of its own F0 (a small static set of window
      lengths, one vectorized pass each, per-frame selection)."""
    if win_length == 0:
        refs = BAP_F0_REFS
        passes = []
        for f0_ref in refs:
            passes.append(_bap_pass(x, f0, sample_rate, hop_length,
                                    bap_window_length(sample_rate, f0_ref),
                                    n_bands))
        out = passes[0]
        for f0_ref, ap in zip(refs[1:], passes[1:]):
            sel = (f0 >= f0_ref)[..., :out.shape[-2], None]
            out = jnp.where(sel, ap, out)
        return out
    return _bap_pass(x, f0, sample_rate, hop_length, win_length, n_bands)


def _bap_pass(x, f0, sample_rate, hop_length, win_length, n_bands):
    """One fixed-window band-aperiodicity pass. The lag is refined per
    frame by maximizing the FULL-band fractional autocorrelation over a
    small offset grid around sample_rate/f0 (absorbs residual
    F0-estimator error; band-independent, so it cannot inflate a noise
    band's score)."""
    n_fft = int(2 ** np.ceil(np.log2(2 * win_length)))
    n_bins = n_fft // 2 + 1

    frames = frame_signal(x, win_length, hop_length, center=True)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    win_np = np.hanning(win_length + 1)[:-1].astype(np.float32)
    win = jnp.asarray(win_np)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    wac = np.fft.irfft(np.abs(np.fft.rfft(win_np, n_fft)) ** 2, n_fft)
    wac = np.maximum((wac / wac[0]).astype(np.float32), 1e-3)

    n_frames = frames.shape[-2]
    f0 = f0[..., :n_frames]
    lag = jnp.where(f0 > 0, sample_rate / jnp.maximum(f0, 1.0), 1.0)

    # irfft weights for a cos-sum over the half spectrum
    w_np = np.full(n_bins, 2.0, np.float32)
    w_np[0] = 1.0
    if n_fft % 2 == 0:
        w_np[-1] = 1.0
    k = jnp.asarray(np.arange(n_bins, dtype=np.float32))
    omega = 2.0 * np.pi / n_fft

    def ac_at(p, tau):
        """(..., n_frames, n_bins) weighted power, (..., n_frames) lag ->
        fractional-lag autocorrelation (..., n_frames)."""
        return jnp.sum(p * jnp.cos(omega * tau[..., None] * k), axis=-1)

    pw = power * jnp.asarray(w_np)
    # refine the lag on the FULL-band fractional autocorrelation: pick the
    # best offset on a small grid (absorbs F0 rounding/estimation error;
    # band-independent, so it cannot inflate a noise band's score)
    offsets = np.linspace(-0.6, 0.6, 7).astype(np.float32)
    cands = jnp.stack([ac_at(pw, lag + o) for o in offsets], axis=-1)
    best = jnp.argmax(cands, axis=-1)
    lag = lag + jnp.asarray(offsets)[best]
    # window de-bias at the (fractional) lag — linear interp of the
    # window's own autocorrelation taper
    li = jnp.clip(jnp.floor(lag).astype(jnp.int32), 0, n_fft - 2)
    fr = lag - li.astype(jnp.float32)
    wac_j = jnp.asarray(wac)
    wl = wac_j[li] * (1.0 - fr) + wac_j[li + 1] * fr

    edges = np.linspace(0, n_bins, n_bands + 1).astype(int)
    aps = []
    for b in range(n_bands):
        mask = np.zeros(n_bins, np.float32)
        mask[edges[b]:edges[b + 1]] = 1.0
        pb = pw * jnp.asarray(mask)
        ac0 = jnp.maximum(jnp.sum(pb, axis=-1), 1e-12)
        acl = ac_at(pb, lag)
        ap = 1.0 - jnp.clip(acl / (ac0 * wl), 0.0, 1.0)
        aps.append(jnp.where(f0 > 0, ap, 1.0))
    return jnp.stack(aps, axis=-1)


def log_f0(f0, vuv, floor: float = 1.0):
    """Continuous log-F0 (0 where unvoiced) — the conditioning encoding."""
    return jnp.where(vuv > 0, jnp.log(jnp.maximum(f0, floor)), 0.0)
