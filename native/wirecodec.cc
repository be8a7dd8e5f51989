// Native encoder for the compressed streaming wire format
// (rrtmg_lw_tpu/parallel/wire.py).
//
// The encoder runs on the host prefetch thread for every streamed
// batch (production: one (B=16384, L=60) batch every few hundred ms);
// these loops implement the same spec as the numpy reference encoders
// bit-for-bit (double-precision arithmetic, same median definition,
// same rounding) so the two paths are interchangeable — tests assert
// code-level equality.
//
// Layout contract: x is C-contiguous (B, K) float64; codes out is
// (B, K) uint16; ref out is (K,); rng out is {lo, hi}.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// numpy median semantics: average of the two middle order statistics
// for even n (on a copy; input untouched).
double median_col(const double* x, long long B, long long K,
                  long long k, std::vector<double>& buf) {
  buf.resize(B);
  for (long long i = 0; i < B; ++i) buf[i] = x[i * K + k];
  long long m = B / 2;
  std::nth_element(buf.begin(), buf.begin() + m, buf.end());
  double hi = buf[m];
  if (B % 2) return hi;
  double lo = *std::max_element(buf.begin(), buf.begin() + m);
  return 0.5 * (lo + hi);
}

}  // namespace

extern "C" {

// logratio codec: code 0 == exact zero; codes 1..65535 span
// [lo, hi] in log(x / ref_level).  Returns the number of positive
// elements (0 => caller should flag the channel all-zero instead).
long long wc_enc_logratio(const double* x, long long B, long long K,
                          double* ref, double* rng, uint16_t* u) {
  std::vector<double> buf;
  long long npos = 0;
  // ref = median; where median <= 0, max of (pos ? x : 1.0)
  for (long long k = 0; k < K; ++k) {
    double m = median_col(x, B, K, k, buf);
    if (m > 0.0) {
      ref[k] = m;
    } else {
      double mx = -INFINITY;
      for (long long i = 0; i < B; ++i) {
        double v = x[i * K + k];
        mx = std::max(mx, v > 0.0 ? v : 1.0);
      }
      ref[k] = mx;
    }
  }
  double lo = INFINITY, hi = -INFINITY;
  std::vector<double> r((size_t)B * K, 0.0);
  for (long long i = 0; i < B; ++i) {
    for (long long k = 0; k < K; ++k) {
      double v = x[i * K + k];
      if (v > 0.0) {
        double rr = std::log(v / ref[k]);
        r[i * K + k] = rr;
        lo = std::min(lo, rr);
        hi = std::max(hi, rr);
        ++npos;
      }
    }
  }
  if (npos == 0) { lo = 0.0; hi = 0.0; }
  hi = std::max(hi, lo + 1e-12);
  rng[0] = lo;
  rng[1] = hi;
  // op order mirrors the numpy encoder exactly ((r-lo)/(hi-lo)*scale,
  // llrint == np.rint round-half-even) so codes match bit-for-bit
  for (long long i = 0; i < B; ++i) {
    for (long long k = 0; k < K; ++k) {
      double v = x[i * K + k];
      if (v > 0.0) {
        double q = (r[i * K + k] - lo) / (hi - lo) * 65534.0;
        u[i * K + k] = (uint16_t)(std::llrint(q) + 1);
      } else {
        u[i * K + k] = 0;
      }
    }
  }
  return npos;
}

// delta codec: codes 0..65535 span [lo, hi] in (x - ref_level).
void wc_enc_delta(const double* x, long long B, long long K,
                  double* ref, double* rng, uint16_t* u) {
  std::vector<double> buf;
  for (long long k = 0; k < K; ++k) ref[k] = median_col(x, B, K, k, buf);
  double lo = INFINITY, hi = -INFINITY;
  for (long long i = 0; i < B; ++i) {
    for (long long k = 0; k < K; ++k) {
      double d = x[i * K + k] - ref[k];
      lo = std::min(lo, d);
      hi = std::max(hi, d);
    }
  }
  hi = std::max(hi, lo + 1e-12);
  rng[0] = lo;
  rng[1] = hi;
  for (long long i = 0; i < B; ++i) {
    for (long long k = 0; k < K; ++k) {
      double d = x[i * K + k] - ref[k];
      u[i * K + k] =
          (uint16_t)std::llrint((d - lo) / (hi - lo) * 65535.0);
    }
  }
}

}  // extern "C"
