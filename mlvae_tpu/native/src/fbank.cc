// Kaldi-compatible log-mel filterbank front-end (native host path).
//
// Replaces the reference's four Kaldi subprocess stages
// (compute-fbank-feats / add-deltas / compute-cmvn-stats / apply-cmvn,
// reference utils/data_io_utils.py:99-206) with an in-process
// implementation: snip-edges=false centered framing with edge reflection,
// DC-offset removal, 0.97 pre-emphasis, symmetric Hamming window,
// power-of-two padded radix-2 FFT, mel triangles on 1127*ln(1+f/700)
// between 20 Hz and Nyquist, natural-log energies floored at float epsilon.
// Semantics identical to the numpy golden in mlvae_tpu/ops/frontend_ref.py
// (tested to 1e-4).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

int next_pow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

// iterative radix-2 complex FFT (in-place), n a power of two
void fft(std::vector<double>& re, std::vector<double>& im) {
  const int n = static_cast<int>(re.size());
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        const double ur = re[i + k], ui = im[i + k];
        const double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        const double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

double mel_scale(double hz) { return 1127.0 * std::log1p(hz / 700.0); }

}  // namespace

extern "C" {

// number of frames for snip-edges=false framing
int32_t mlvae_kaldi_num_frames(int32_t num_samples, int32_t shift) {
  return (num_samples + shift / 2) / shift;
}

// wave (L) -> out (T * n_mels); returns T
int32_t mlvae_kaldi_fbank(const float* wave, int32_t num_samples,
                          int32_t sample_rate, int32_t shift, int32_t window,
                          int32_t n_mels, float* out) {
  const int padded = next_pow2(window);
  const int n_bins = padded / 2 + 1;
  const int T = mlvae_kaldi_num_frames(num_samples, shift);

  // mel bank (n_mels x n_bins), triangles in the mel domain
  const double low_freq = 20.0, high_freq = sample_rate / 2.0;
  const double mel_low = mel_scale(low_freq), mel_high = mel_scale(high_freq);
  const double delta = (mel_high - mel_low) / (n_mels + 1);
  std::vector<double> bin_mels(n_bins);
  for (int k = 0; k < n_bins; ++k)
    bin_mels[k] = mel_scale(k * (double)sample_rate / padded);

  std::vector<double> ham(window);
  for (int i = 0; i < window; ++i)
    ham[i] = 0.54 - 0.46 * std::cos(2.0 * kPi * i / (window - 1));

  const float kEps = 1.1920928955078125e-07f;  // float32 epsilon

  // mel triangle weights are frame-independent: precompute the nonzero
  // [start, end) range and weights per mel (recomputing them per frame
  // cost ~2x the FFT itself)
  std::vector<std::vector<double>> mel_w(n_mels);
  std::vector<int> mel_start(n_mels), mel_end(n_mels);
  for (int m = 0; m < n_mels; ++m) {
    const double left = mel_low + m * delta;
    const double center = left + delta;
    const double right = center + delta;
    int start = -1, end = 0;
    std::vector<double> w_row;
    for (int k = 0; k < n_bins; ++k) {
      const double up = (bin_mels[k] - left) / (center - left);
      const double down = (right - bin_mels[k]) / (right - center);
      const double w = std::max(0.0, std::min(up, down));
      if (w > 0.0) {
        if (start < 0) start = k;
        end = k + 1;
        w_row.push_back(w);
      } else if (start >= 0) {
        break;  // triangles are contiguous
      }
    }
    mel_start[m] = start < 0 ? 0 : start;
    mel_end[m] = end;
    mel_w[m] = std::move(w_row);
  }

  std::vector<double> frame(window), re(padded), im(padded),
      power(n_bins);
  for (int t = 0; t < T; ++t) {
    const long first = (long)t * shift + shift / 2 - window / 2;
    double mean = 0.0;
    for (int i = 0; i < window; ++i) {
      long j = first + i;
      // Kaldi iterates the reflection until in range (matters for
      // utterances shorter than half a window); mirrors the closed form in
      // ops/fbank.kaldi_frame_gather and frontend_ref._reflect_index
      while (j < 0 || j >= num_samples) {
        if (j < 0) j = -j - 1;                        // reflect left
        else j = 2L * num_samples - 1 - j;            // reflect right
      }
      frame[i] = wave[j];
      mean += frame[i];
    }
    mean /= window;
    for (int i = 0; i < window; ++i) frame[i] -= mean;  // remove DC
    for (int i = window - 1; i > 0; --i)
      frame[i] -= 0.97 * frame[i - 1];  // pre-emphasis
    frame[0] -= 0.97 * frame[0];
    for (int i = 0; i < window; ++i) frame[i] *= ham[i];

    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    std::copy(frame.begin(), frame.end(), re.begin());
    fft(re, im);
    for (int k = 0; k < n_bins; ++k)
      power[k] = re[k] * re[k] + im[k] * im[k];

    for (int m = 0; m < n_mels; ++m) {
      double energy = 0.0;
      const int start = mel_start[m];
      const int n = static_cast<int>(mel_w[m].size());
      for (int k = 0; k < n; ++k) energy += mel_w[m][k] * power[start + k];
      out[(long)t * n_mels + m] =
          std::log(std::max(energy, (double)kEps));
    }
  }
  return T;
}

// Kaldi add-deltas: EXACT DeltaFeatures semantics (feature-functions.cc) —
// each order's filter is the previous filter convolved with the +-window
// regression kernel, and the COMPOSITE filter is applied to the ORIGINAL
// features with one edge clamp.  (Iterating the regression with per-order
// clamping deviates from Kaldi by up to ~0.15 at the first/last frames.)
// feats (T x C) -> out (T x C*(order+1))
void mlvae_add_deltas(const float* feats, int32_t T, int32_t C, int32_t order,
                      int32_t window, float* out) {
  const int out_c = C * (order + 1);
  if (T <= 0 || C <= 0) return;

  std::vector<std::vector<double>> scales(order + 1);
  scales[0] = {1.0};
  double normalizer = 0.0;
  for (int j = -window; j <= window; ++j) normalizer += (double)j * j;
  for (int o = 1; o <= order; ++o) {
    const std::vector<double>& prev = scales[o - 1];
    const int prev_off = (static_cast<int>(prev.size()) - 1) / 2;
    const int cur_off = prev_off + window;
    std::vector<double> cur(prev.size() + 2 * window, 0.0);
    for (int j = -window; j <= window; ++j)
      for (int k = -prev_off; k <= prev_off; ++k)
        cur[j + k + cur_off] += (double)j * prev[k + prev_off];
    for (double& v : cur) v /= normalizer;
    scales[o] = std::move(cur);
  }

  for (int o = 0; o <= order; ++o) {
    const std::vector<double>& sc = scales[o];
    const int off = (static_cast<int>(sc.size()) - 1) / 2;
    for (int t = 0; t < T; ++t) {
      for (int c = 0; c < C; ++c) {
        double acc = 0.0;
        for (int j = -off; j <= off; ++j) {
          if (sc[j + off] == 0.0) continue;
          const int tf = std::min(std::max(t + j, 0), T - 1);
          acc += sc[j + off] * feats[(long)tf * C + c];
        }
        out[(long)t * out_c + o * C + c] = (float)acc;
      }
    }
  }
}

// accumulate CMVN sufficient statistics over one utterance
void mlvae_cmvn_accumulate(const float* feats, int32_t T, int32_t C,
                           double* total, double* sq, double* count) {
  for (int t = 0; t < T; ++t)
    for (int c = 0; c < C; ++c) {
      const double v = feats[(long)t * C + c];
      total[c] += v;
      sq[c] += v * v;
    }
  *count += T;
}

// apply per-speaker CMVN in place
void mlvae_cmvn_apply(float* feats, int32_t T, int32_t C, const double* total,
                      const double* sq, double count, int32_t norm_vars) {
  for (int c = 0; c < C; ++c) {
    const double mean = total[c] / count;
    double scale = 1.0;
    if (norm_vars) {
      const double var = std::max(sq[c] / count - mean * mean, 1e-20);
      scale = 1.0 / std::sqrt(var);
    }
    for (int t = 0; t < T; ++t) {
      float* p = feats + (long)t * C + c;
      *p = (float)((*p - mean) * scale);
    }
  }
}

}  // extern "C"
