// Native WORLD/SPTK-equivalent feature extraction — CPU fast path for the
// data-prep stage's pooled workers.
//
// The reference's feature extractor calls WORLD (C++: F0 / envelope /
// aperiodicity) and SPTK (C: mcep/freqt) per utterance from a
// multiprocessing pool (SURVEY.md §3.2, components C12/C13). This file is
// that native surface rebuilt in-repo: the SAME algorithms as the JAX ops
// (ops/f0.py estimate_f0 / band_aperiodicity, ops/mcep.py mcep_analysis —
// kept in exact sync; cross-checked by tests/test_native_featext.py) so the
// pooled numpy-only workers can emit the full `world` feature set without
// importing JAX. Exposed via a plain C ABI and loaded with ctypes
// (utils/native.py; no pybind11 in this image).
//
// All internal math is double precision; outputs are float32. The JAX ops
// run fp32, so parity tests use tolerances, not bit-equality.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Iterative radix-2 complex FFT (in-place, size must be a power of two).
// Sizes here are <= 8192; double precision throughout.
void fft(std::vector<double>& re, std::vector<double>& im, bool inverse) {
  const size_t n = re.size();
  // bit-reversal permutation
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * kPi / static_cast<double>(len) *
                       (inverse ? 1.0 : -1.0);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t j = 0; j < len / 2; ++j) {
        const size_t a = i + j, b = i + j + len / 2;
        const double xr = re[b] * cr - im[b] * ci;
        const double xi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
  if (inverse) {
    const double inv = 1.0 / static_cast<double>(n);
    for (size_t i = 0; i < n; ++i) {
      re[i] *= inv;
      im[i] *= inv;
    }
  }
}

// Power spectrum |FFT(x)|^2 of a real frame zero-padded to n_fft, then
// inverse-FFT back to the (real, even) autocorrelation — Wiener-Khinchin,
// the same route as ops/f0.py _norm_autocorr.
void autocorr_via_fft(const std::vector<double>& x, size_t n_fft,
                      std::vector<double>& ac_out) {
  std::vector<double> re(n_fft, 0.0), im(n_fft, 0.0);
  for (size_t i = 0; i < x.size(); ++i) re[i] = x[i];
  fft(re, im, /*inverse=*/false);
  for (size_t i = 0; i < n_fft; ++i) {
    re[i] = re[i] * re[i] + im[i] * im[i];
    im[i] = 0.0;
  }
  fft(re, im, /*inverse=*/true);
  ac_out.assign(re.begin(), re.end());
}

// numpy/jnp reflect padding index: sample at global position i of a signal
// padded `pad` samples on each side (edge sample not repeated).
inline int64_t reflect_index(int64_t i, int64_t t) {
  if (t <= 1) return 0;  // degenerate signal: reflection has no period
  while (i < 0 || i >= t) {
    if (i < 0) i = -i;
    if (i >= t) i = 2 * t - 2 - i;
  }
  return i;
}

// Hann window, numpy convention: np.hanning(win+1)[:-1].
std::vector<double> hann(int win) {
  std::vector<double> w(win);
  for (int i = 0; i < win; ++i)
    w[i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / static_cast<double>(win));
  return w;
}

// Centered frame (reflect padding win/2 each side) starting at
// frame_index * hop, mean-removed iff remove_mean, then windowed.
void window_frame(const float* x, int64_t t, int win, int hop, int64_t frame,
                  const std::vector<double>& w, bool remove_mean,
                  std::vector<double>& out) {
  const int64_t pad = win / 2;
  out.resize(win);
  double mean = 0.0;
  for (int i = 0; i < win; ++i) {
    out[i] = x[reflect_index(frame * hop - pad + i, t)];
    mean += out[i];
  }
  if (remove_mean) {
    mean /= win;
    for (int i = 0; i < win; ++i) out[i] -= mean;
  }
  for (int i = 0; i < win; ++i) out[i] *= w[i];
}

// Normalized autocorrelation of the (already windowed) analysis window
// itself — the de-bias divisor of ops/f0.py (clipped below at 1e-3).
std::vector<double> window_autocorr(const std::vector<double>& w,
                                    size_t n_fft) {
  std::vector<double> wac;
  autocorr_via_fft(w, n_fft, wac);
  const double w0 = wac[0];
  for (auto& v : wac) v = std::max(v / w0, 1e-3);
  return wac;
}

inline size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// F0 + voicing, the exact algorithm of ops/f0.py estimate_f0:
// normalized autocorrelation -> de-bias by the window autocorrelation ->
// YIN-style CMND lag selection over [lag_min, lag_max] ->
// re-maximize the window-de-biased values in a +-3 neighborhood ->
// parabolic interpolation -> octave/subharmonic guard (prefer ~lag/m,
// m = 2, 3, when its de-biased value is >= 0.9 * peak) -> clarity/energy/
// range voicing gate -> temporal continuity repair (5-frame voiced
// median replaces > 18% outliers).
// x: (t,) float32. out_f0/out_vuv: (n_frames,) float32,
// n_frames = 1 + (t + 2*(win/2) - win) / hop.
void swt_f0_estimate(const float* x, int64_t t, double sample_rate, int hop,
                     int win, double f0_min, double f0_max, double threshold,
                     float* out_f0, float* out_vuv, int64_t n_frames) {
  const int lag_min = std::max(static_cast<int>(sample_rate / f0_max), 1);
  const int lag_max = static_cast<int>(std::ceil(sample_rate / f0_min));
  const size_t n_fft = next_pow2(static_cast<size_t>(win + lag_max + 1));
  const int span = lag_max - lag_min;

  const std::vector<double> w = hann(win);
  const std::vector<double> wac = window_autocorr(w, n_fft);

  std::vector<double> f0_raw(n_frames, 0.0);
  std::vector<double> frame, ac;
  for (int64_t f = 0; f < n_frames; ++f) {
    window_frame(x, t, win, hop, f, w, /*remove_mean=*/true, frame);
    double energy = 0.0;
    for (double v : frame) energy += v * v;
    energy /= win;

    autocorr_via_fft(frame, n_fft, ac);
    const double ac0 = std::max(ac[0], 1e-12);

    auto debiased = [&](int k) {
      return ac[lag_min + k] / ac0 / wac[lag_min + k];
    };
    // YIN-style CMND selection over the de-biased autocorrelation: first
    // dip below max(0.2, 1.25 * frame min), walked to its local minimum;
    // global argmin as the no-dip fallback. Kept in exact lockstep with
    // ops/f0.py estimate_f0 — see there for the measured rationale (the
    // old biased argmax picked the zero-lag shoulder over
    // taper-suppressed low-F0 peaks whenever the search range was wide).
    int k0 = 0;
    {
      std::vector<double> cm(span + 1);
      double cum = 0.0, best = 1e300;
      for (int tau = 1; tau <= lag_max; ++tau) {
        const double ru = ac[tau] / ac0 / wac[tau];
        const double d = std::max(1.0 - ru, 1e-6);
        cum += d;
        if (tau >= lag_min) {
          const double c = d * tau / std::max(cum, 1e-9);
          cm[tau - lag_min] = c;
          if (c < best) {
            best = c;
            k0 = tau - lag_min;
          }
        }
      }
      // threshold relative to the frame's own global min (>= 0.2): the
      // first dip within 1.25x of the min, walked to its local minimum
      const double theta = std::max(best * 1.25, 0.2);
      int first_below = -1;
      for (int j = 0; j <= span; ++j) {
        if (cm[j] < theta) {
          first_below = j;
          break;
        }
      }
      if (first_below >= 0) {
        int j = first_below;
        while (j < span && cm[j + 1] < cm[j]) ++j;
        k0 = j;
      }
    }
    // de-biased re-maximization around j0 + parabolic refinement — the
    // refine() helper of ops/f0.py
    auto refine = [&](int j0, int window, int* j_out, double* v_out,
                      double* d_out) {
      int j = 0;
      double b2 = -1e300;
      for (int off = -window; off <= window; ++off) {
        const int kk = std::min(std::max(j0 + off, 0), span);
        const double v = debiased(kk);
        if (v > b2) {
          b2 = v;
          j = kk;
        }
      }
      const double v = debiased(j);
      const double jm1 = debiased(std::max(j - 1, 0));
      const double jp1 = debiased(std::min(j + 1, span));
      const double denom = jm1 - 2.0 * v + jp1;
      double delta =
          std::fabs(denom) > 1e-9 ? 0.5 * (jm1 - jp1) / denom : 0.0;
      *j_out = j;
      *v_out = v;
      *d_out = std::min(std::max(delta, -0.5), 0.5);
    };

    int k;
    double peak, delta;
    refine(k0, 3, &k, &peak, &delta);
    double lag = lag_min + k + delta;
    // octave/subharmonic guard (see ops/f0.py): the global max can land an
    // integer multiple of the true period low — prefer ~lag/m when nearly
    // as high
    for (int m = 2; m <= 3; ++m) {
      const int jc =
          static_cast<int>(std::llround((lag_min + k) / static_cast<double>(m)))
          - lag_min;
      if (jc < 0) continue;
      int jc_;
      double vc, dc;
      refine(jc, 2, &jc_, &vc, &dc);
      if (vc >= 0.9 * peak) lag = lag_min + jc_ + dc;
    }
    const double f0 = sample_rate / std::max(lag, 1.0);

    const bool voiced = peak > threshold && energy > 1e-6 && f0 >= f0_min &&
                        f0 <= f0_max;
    out_vuv[f] = voiced ? 1.0f : 0.0f;
    f0_raw[f] = f0;
  }

  // temporal continuity repair — _correct_outliers of ops/f0.py: 5-frame
  // median with unvoiced neighbors replaced by the center value; REFLECT
  // padding (edge-clamp let frame 0 fill 3 of its own 5 slots, so an
  // octave error at a voiced utterance start self-confirmed — see the
  // ops/f0.py docstring); voiced frames deviating > 18% take the median
  for (int64_t f = 0; f < n_frames; ++f) {
    if (out_vuv[f] == 0.0f) {
      out_f0[f] = 0.0f;
      continue;
    }
    double wv[5];
    for (int o = -2; o <= 2; ++o) {
      int64_t j = f + o;
      if (n_frames >= 3) {
        if (j < 0) j = -j;
        if (j > n_frames - 1) j = 2 * (n_frames - 1) - j;
      }
      j = std::min(std::max<int64_t>(j, 0), n_frames - 1);
      wv[o + 2] = out_vuv[j] > 0.0f ? f0_raw[j] : f0_raw[f];
    }
    // median of 5 by partial sort
    std::sort(wv, wv + 5);
    const double med = wv[2];
    const double v =
        std::fabs(f0_raw[f] - med) > 0.18 * med ? med : f0_raw[f];
    out_f0[f] = static_cast<float>(v);
  }
}

// Band aperiodicity, the exact algorithm of ops/f0.py _bap_pass (one
// fixed-window pass; the F0-adaptive window selection across passes lives
// in utils/native.py, mirroring ops/f0.band_aperiodicity): per band,
// 1 - window-de-biased normalized band-limited autocorrelation at the
// FRACTIONAL F0 lag, the lag first refined by maximizing the full-band
// fractional autocorrelation over a small offset grid; 1.0 where
// unvoiced. The fractional-lag autocorrelation is evaluated directly in
// the frequency domain: ac(tau) = sum_k w_k |X_k|^2 cos(omega k tau)
// over rFFT bins (w = 2 except DC/Nyquist) — no inverse FFT per band.
// out: (n_frames, n_bands) float32 row-major.
void swt_band_aperiodicity(const float* x, int64_t t, const float* f0,
                           double sample_rate, int hop, int win, int n_bands,
                           float* out, int64_t n_frames) {
  const size_t n_fft = next_pow2(static_cast<size_t>(2 * win));
  const size_t n_bins = n_fft / 2 + 1;
  const std::vector<double> w = hann(win);
  const std::vector<double> wac = window_autocorr(w, n_fft);
  const double omega = 2.0 * kPi / static_cast<double>(n_fft);
  // np.linspace(-0.6, 0.6, 7) — the full-band lag refinement grid
  const double offs[7] = {-0.6, -0.4, -0.2, 0.0, 0.2, 0.4, 0.6};

  // band edges: np.linspace(0, n_bins, n_bands + 1).astype(int)
  std::vector<size_t> edges(n_bands + 1);
  for (int b = 0; b <= n_bands; ++b)
    edges[b] = static_cast<size_t>(static_cast<double>(n_bins) * b / n_bands);

  std::vector<double> frame, re, im, pw(n_bins);
  for (int64_t f = 0; f < n_frames; ++f) {
    const double f0v = f0[f];
    if (f0v <= 0.0) {
      for (int b = 0; b < n_bands; ++b) out[f * n_bands + b] = 1.0f;
      continue;
    }
    window_frame(x, t, win, hop, f, w, /*remove_mean=*/true, frame);
    re.assign(n_fft, 0.0);
    im.assign(n_fft, 0.0);
    for (size_t i = 0; i < frame.size(); ++i) re[i] = frame[i];
    fft(re, im, /*inverse=*/false);
    // irfft-weighted rFFT power: 2x interior bins, 1x DC and Nyquist
    for (size_t k = 0; k < n_bins; ++k) {
      const double p = re[k] * re[k] + im[k] * im[k];
      pw[k] = (k == 0 || k == n_fft / 2) ? p : 2.0 * p;
    }

    const auto ac_at = [&](double tau, size_t lo, size_t hi) {
      double s = 0.0;
      for (size_t k = lo; k < hi; ++k) s += pw[k] * std::cos(omega * tau * k);
      return s;
    };

    // refine the lag on the FULL-band fractional autocorrelation (first
    // max wins ties, matching jnp.argmax)
    const double lag0 = sample_rate / std::max(f0v, 1.0);
    double lag = lag0 + offs[0];
    double best = ac_at(lag, 0, n_bins);
    for (int o = 1; o < 7; ++o) {
      const double v = ac_at(lag0 + offs[o], 0, n_bins);
      if (v > best) {
        best = v;
        lag = lag0 + offs[o];
      }
    }
    // window de-bias at the fractional lag (linear interp of wac)
    int64_t li = static_cast<int64_t>(std::floor(lag));
    li = std::min(std::max<int64_t>(li, 0),
                  static_cast<int64_t>(n_fft) - 2);
    const double fr = lag - static_cast<double>(li);
    const double wl = wac[li] * (1.0 - fr) + wac[li + 1] * fr;

    for (int b = 0; b < n_bands; ++b) {
      double ac0 = 0.0;
      for (size_t k = edges[b]; k < edges[b + 1]; ++k) ac0 += pw[k];
      ac0 = std::max(ac0, 1e-12);
      const double acl = ac_at(lag, edges[b], edges[b + 1]);
      const double ap =
          1.0 - std::min(std::max(acl / (ac0 * wl), 0.0), 1.0);
      out[f * n_bands + b] = static_cast<float>(ap);
    }
  }
}

// Mel-cepstral analysis, the exact algorithm of ops/mcep.py mcep_analysis:
// centered Hann frame -> zero-pad to n_fft -> log|rFFT| (floor eps) ->
// cepstrum -> (optional F0-adaptive lag window) -> minimum-phase doubling
// -> freqt recursion to order M at warping alpha (the SPTK freqt C loop
// itself, not the dense-matrix form the TPU path uses).
// f0: optional per-frame F0 track (NULL = no smoothing; unvoiced <= 0
// frames use f0_default) — multiplying cepstrum k by sinc(k*f0/sr)
// averages the log spectrum across one harmonic spacing, the envelope
// smoothing of ops/mcep.spectrum_to_mcep.
// out: (n_frames, order + 1) float32 row-major.
void swt_mcep_f0(const float* x, int64_t t, int n_fft, int hop, int win,
                 int order, double alpha, double eps, const float* f0,
                 int64_t n_f0, double sample_rate, double f0_default,
                 float* out, int64_t n_frames) {
  // the radix-2 FFT requires a power-of-two size; the Python wrapper
  // validates, this is the memory-safety backstop
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) != 0) return;
  const std::vector<double> w = hann(win);
  const size_t m1 = static_cast<size_t>(n_fft) / 2;
  // centered zero-pad to n_fft; when win >= n_fft, match the JAX twin's
  // jnp.fft.rfft(frames, n=n_fft): no pad, truncate to the first n_fft
  const int pad_l = win < n_fft ? (n_fft - win) / 2 : 0;
  const int n_copy = std::min(win, n_fft);

  std::vector<double> frame, re, im, cep(m1 + 1);
  std::vector<double> g(order + 1), gn(order + 1);
  const double b = 1.0 - alpha * alpha;

  for (int64_t f = 0; f < n_frames; ++f) {
    window_frame(x, t, win, hop, f, w, /*remove_mean=*/false, frame);
    re.assign(n_fft, 0.0);
    im.assign(n_fft, 0.0);
    for (int i = 0; i < n_copy; ++i) re[pad_l + i] = frame[i];
    fft(re, im, /*inverse=*/false);
    // log-magnitude on rfft bins, mirrored back to the full (hermitian)
    // spectrum, then inverse FFT -> real cepstrum
    for (size_t i = 0; i <= m1; ++i) {
      const double mag = std::sqrt(re[i] * re[i] + im[i] * im[i]);
      re[i] = std::log(std::max(mag, eps));
      im[i] = 0.0;
    }
    for (size_t i = m1 + 1; i < static_cast<size_t>(n_fft); ++i) {
      re[i] = re[n_fft - i];
      im[i] = 0.0;
    }
    fft(re, im, /*inverse=*/true);
    if (f0 != nullptr && n_f0 > 0 && sample_rate > 0) {
      // lag window on the full cepstrum BEFORE truncation (matches the
      // JAX path; edge-pad the f0 track to this frame count)
      const double f0v_raw = f0[std::min(f, n_f0 - 1)];
      const double f0n = (f0v_raw > 0.0 ? f0v_raw : f0_default) / sample_rate;
      for (size_t i = 1; i <= m1; ++i) {
        const double a = M_PI * static_cast<double>(i) * f0n;
        re[i] *= std::sin(a) / a;
      }
    }
    // minimum-phase doubling: h0 = c0, hk = 2 ck, Nyquist h[m1] = c[m1]
    cep[0] = re[0];
    for (size_t i = 1; i < m1; ++i) cep[i] = 2.0 * re[i];
    cep[m1] = re[m1];

    // freqt (Oppenheim-Johnson recursion, highest input coefficient first)
    std::fill(g.begin(), g.end(), 0.0);
    for (int64_t i = static_cast<int64_t>(m1); i >= 0; --i) {
      gn[0] = cep[i] + alpha * g[0];
      if (order >= 1) gn[1] = b * g[0] + alpha * g[1];
      for (int j = 2; j <= order; ++j)
        gn[j] = g[j - 1] + alpha * (g[j] - gn[j - 1]);
      std::swap(g, gn);
    }
    for (int j = 0; j <= order; ++j)
      out[f * (order + 1) + j] = static_cast<float>(g[j]);
  }
}

// Unsmoothed entry point (the original ABI).
void swt_mcep(const float* x, int64_t t, int n_fft, int hop, int win,
              int order, double alpha, double eps, float* out,
              int64_t n_frames) {
  swt_mcep_f0(x, t, n_fft, hop, win, order, alpha, eps, nullptr, 0, 0.0,
              0.0, out, n_frames);
}

}  // extern "C"
