// Native MLSA filter — CPU fast path for the noise-shaping data-prep stage.
//
// The reference pipeline's native surface is SPTK's C `mlsadf` (SURVEY.md
// §2.3, component C13); this is the TPU framework's equivalent, exposed via
// a C ABI and loaded with ctypes (no pybind11 in this image). The algorithm
// is the same [L/L]-Pade realization as ops/mlsa.py (kept in exact sync;
// the cross-check test is tests/test_mlsa_native.py):
//
//   t_l = F^l v (cascaded strictly-causal basic filters)
//   v   = x + sum_l A_l (-1)^{l+1} t_l
//   y   = exp(b0) * (v + sum_l A_l t_l)
//
// with the basic filter F(z) = sum_{m>=1} b(m) Phi_m(z), all-pass chain
//   e_1[t] = (1-a^2) u[t-1] + a e_1[t-1]
//   e_m[t] = -a e_{m-1}[t] + e_{m-1}[t-1] + a e_m[t-1]
//
// Build: `make -C native` -> libswt_native.so.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// A_l of the [L/L] Pade approximant of exp at 0.
void pade_coefficients(int L, double* out) {
  auto fact = [](int n) {
    double r = 1.0;
    for (int i = 2; i <= n; ++i) r *= i;
    return r;
  };
  for (int l = 0; l <= L; ++l) {
    out[l] = fact(2 * L - l) * fact(L) /
             (fact(2 * L) * fact(l) * fact(L - l));
  }
}

}  // namespace

extern "C" {

// y[t] = MLSA(b, alpha)(x)[t]; b has order_m+1 mc2b coefficients.
// inverse != 0 filters with -b (de-emphasis restoration).
void swt_mlsa_filter(const float* x, int64_t n, const double* b_in,
                     int order_m, double alpha, int pade_order, int inverse,
                     float* y) {
  const int L = pade_order;
  const int M = order_m;  // number of b[1..M] coefficients
  std::vector<double> b(M + 1);
  for (int m = 0; m <= M; ++m) b[m] = inverse ? -b_in[m] : b_in[m];
  const double gain = std::exp(b[0]);

  std::vector<double> pade(L + 1);
  pade_coefficients(L, pade.data());

  const double aa = 1.0 - alpha * alpha;
  // Per Pade chain l (1..L): all-pass states e[l][1..M] and previous input.
  std::vector<std::vector<double>> e(L, std::vector<double>(M, 0.0));
  std::vector<double> u_prev(L, 0.0);
  std::vector<double> e_new(M), t(L);

  for (int64_t i = 0; i < n; ++i) {
    // advance every chain one step
    for (int l = 0; l < L; ++l) {
      std::vector<double>& el = e[l];
      e_new[0] = aa * u_prev[l] + alpha * el[0];
      for (int m = 1; m < M; ++m) {
        e_new[m] = -alpha * e_new[m - 1] + el[m - 1] + alpha * el[m];
      }
      double acc = 0.0;
      for (int m = 0; m < M; ++m) acc += e_new[m] * b[m + 1];
      t[l] = acc;
      el.assign(e_new.begin(), e_new.end());
    }
    double v = x[i];
    double out = 0.0;
    for (int l = 1; l <= L; ++l) {
      const double term = pade[l] * t[l - 1];
      v += (l & 1) ? term : -term;
      out += term;
    }
    out += v;
    y[i] = static_cast<float>(gain * out);
    // chain inputs for the next step: chain 1 <- v, chain l <- t_{l-1}
    u_prev[0] = v;
    for (int l = 1; l < L; ++l) u_prev[l] = t[l - 1];
  }
}

// mc2b: b[M] = c[M]; b[m] = c[m] - alpha b[m+1].
void swt_mc2b(const double* c, int order_m, double alpha, double* b) {
  b[order_m] = c[order_m];
  for (int m = order_m - 1; m >= 0; --m) b[m] = c[m] - alpha * b[m + 1];
}

}  // extern "C"
