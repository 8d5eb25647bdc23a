// Native host-side DSP core for the data-synthesis pipeline.
//
// The reference's training-data hot loop (dataset_train.py:136-195) runs
// per-sample in Python workers: RIR convolution (scipy fftconvolve),
// amplitude/loudness normalization, SNR mixing, clip rescue. On a TPU pod
// each host must synthesize enough mixtures to keep its devices fed; this
// C++ core executes the whole per-item mix in one call, GIL-free, so the
// loader's worker pool scales with threads instead of processes.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC mixer.cpp -o libfsn_mixer.so

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using cfloat = std::complex<float>;

// Iterative radix-2 Cooley-Tukey FFT (in-place, n must be a power of two).
void fft_inplace(cfloat* a, int64_t n, bool inverse) {
  // bit-reversal permutation
  for (int64_t i = 1, j = 0; i < n; ++i) {
    int64_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int64_t len = 2; len <= n; len <<= 1) {
    const float ang = 2.0f * float(M_PI) / float(len) * (inverse ? 1.0f : -1.0f);
    const cfloat wlen(std::cos(ang), std::sin(ang));
    for (int64_t i = 0; i < n; i += len) {
      cfloat w(1.0f, 0.0f);
      for (int64_t k = 0; k < len / 2; ++k) {
        const cfloat u = a[i + k];
        const cfloat v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (inverse) {
    const float inv = 1.0f / float(n);
    for (int64_t i = 0; i < n; ++i) a[i] *= inv;
  }
}

int64_t next_pow2(int64_t n) {
  int64_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

double rms(const float* x, int64_t n) {
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) acc += double(x[i]) * double(x[i]);
  return std::sqrt(acc / double(n));
}

double peak(const float* x, int64_t n) {
  double m = 0.0;
  for (int64_t i = 0; i < n; ++i) m = std::max(m, double(std::fabs(x[i])));
  return m;
}

void scale(float* x, int64_t n, double s) {
  for (int64_t i = 0; i < n; ++i) x[i] = float(double(x[i]) * s);
}

}  // namespace

extern "C" {

// Linear convolution of x (n) with h (m), truncated to the first n samples
// (the reference keeps fftconvolve(clean, rir)[:len(clean)]).
void fsn_fft_convolve_trunc(const float* x, int64_t n, const float* h,
                            int64_t m, float* out) {
  const int64_t full = n + m - 1;
  const int64_t size = next_pow2(full);
  std::vector<cfloat> fx(size, cfloat(0, 0)), fh(size, cfloat(0, 0));
  for (int64_t i = 0; i < n; ++i) fx[i] = cfloat(x[i], 0);
  for (int64_t i = 0; i < m; ++i) fh[i] = cfloat(h[i], 0);
  fft_inplace(fx.data(), size, false);
  fft_inplace(fh.data(), size, false);
  for (int64_t i = 0; i < size; ++i) fx[i] *= fh[i];
  fft_inplace(fx.data(), size, true);
  for (int64_t i = 0; i < n; ++i) out[i] = fx[i].real();
}

// Full SNR mix (reference dataset_train.py:136-195 semantics).
//
// Inputs are modified copies: clean/noise are buffers of length n the
// caller owns; rir may be null (no reverb). snr in dB;
// noisy_target_dbfs already drawn by the caller (keeps RNG in one place).
// Writes noisy and (scaled) clean in place.
void fsn_snr_mix(float* clean, float* noise, int64_t n, const float* rir,
                 int64_t rir_len, float snr, float target_dbfs,
                 float noisy_target_dbfs, float eps) {
  std::vector<float> reverbed;
  if (rir != nullptr && rir_len > 0) {
    reverbed.resize(n);
    fsn_fft_convolve_trunc(clean, n, rir, rir_len, reverbed.data());
    std::memcpy(clean, reverbed.data(), sizeof(float) * n);
  }

  // norm_amplitude + tailor_dB_FS(clean)
  scale(clean, n, 1.0 / (peak(clean, n) + eps));
  scale(clean, n, std::pow(10.0, target_dbfs / 20.0) / (rms(clean, n) + eps));
  const double clean_rms = rms(clean, n);

  scale(noise, n, 1.0 / (peak(noise, n) + eps));
  scale(noise, n, std::pow(10.0, target_dbfs / 20.0) / (rms(noise, n) + eps));
  const double noise_rms = rms(noise, n);

  const double snr_scalar =
      clean_rms / std::pow(10.0, snr / 20.0) / (noise_rms + eps);
  for (int64_t i = 0; i < n; ++i)
    noise[i] = float(double(noise[i]) * snr_scalar);

  // noisy = clean + noise, re-targeted loudness; clean scaled alike
  std::vector<float> noisy(n);
  for (int64_t i = 0; i < n; ++i) noisy[i] = clean[i] + noise[i];
  const double noisy_scalar =
      std::pow(10.0, noisy_target_dbfs / 20.0) / (rms(noisy.data(), n) + eps);
  for (int64_t i = 0; i < n; ++i) {
    noisy[i] = float(double(noisy[i]) * noisy_scalar);
    clean[i] = float(double(clean[i]) * noisy_scalar);
  }

  // clip rescue (threshold 0.999, rescale to 0.99 - eps)
  const double pk = peak(noisy.data(), n);
  if (pk > 0.999) {
    const double rescale = pk / (0.99 - eps);
    for (int64_t i = 0; i < n; ++i) {
      noisy[i] = float(double(noisy[i]) / rescale);
      clean[i] = float(double(clean[i]) / rescale);
    }
  }
  std::memcpy(noise, noisy.data(), sizeof(float) * n);  // noise buf := noisy
}

// 50 ms-window frame energies in dB (VAD front half, feature.py:207-255).
void fsn_frame_energies_db(const float* x, int64_t n, int64_t window,
                           float eps, float* out, int64_t* out_n) {
  int64_t cnt = 0;
  for (int64_t start = 0; start < n; start += window) {
    const int64_t end = std::min(start + window, n);
    double acc = 0.0;
    for (int64_t i = start; i < end; ++i) acc += double(x[i]) * double(x[i]);
    out[cnt++] = float(20.0 * std::log10(acc + eps));
  }
  *out_n = cnt;
}

int fsn_abi_version() { return 1; }

}  // extern "C"
