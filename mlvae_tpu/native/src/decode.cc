// MD Viterbi decoder: joint DP over (phoneme l, frame t, MD state beta),
// OpenMP-parallel over the batch.
//
// Host-side counterpart of the on-device lax.scan decoder in
// mlvae_tpu/ops/decode.py (same recurrence, same argmax tie-breaking:
// hold < from-correct < from-incorrect). Replaces the reference's
// joblib process-per-utterance numpy DP (reference
// utils/decode_utils.py:374-565) for host pipelines: one fork-free pass,
// vectorizable inner loop, threads over utterances.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
constexpr double kNegInf = -1e30;
}

extern "C" {

// One utterance:
//  log_p_yx: (T x N x 2), log_p_y: (N x 2), y: (L,), log_p_b: (T x 2),
//  log_p_pi: (T x 2); outputs boundary (T), flvl (T), plvl (L) int32.
void mlvae_md_viterbi_one(const float* log_p_yx, const float* log_p_y,
                          const int32_t* y, const float* log_p_b,
                          const float* log_p_pi, int32_t T, int32_t L,
                          int32_t N, float weight, int32_t* boundary,
                          int32_t* flvl, int32_t* plvl) {
  // empty utterance/label sequence: nothing decodable; without this guard
  // flvl[T-1]/plvl[l] below would write before the output buffers
  if (T <= 0 || L <= 0) return;
  // emissions e[t][l][b] = log_p_yx[t, y[l], b] - log_p_y[y[l], b]
  std::vector<double> dp((size_t)L * 2, kNegInf);
  std::vector<int8_t> path((size_t)T * L * 2, 0);

  auto emis = [&](int t, int l, int b) -> double {
    const int yl = y[l];
    return (double)log_p_yx[((size_t)t * N + yl) * 2 + b] -
           (double)log_p_y[(size_t)yl * 2 + b];
  };

  dp[0 * 2 + 0] = weight * log_p_pi[0] + emis(0, 0, 0);
  dp[0 * 2 + 1] = weight * log_p_pi[1] + emis(0, 0, 1);

  std::vector<double> ndp((size_t)L * 2);
  for (int t = 1; t < T; ++t) {
    const double lb0 = log_p_b[(size_t)t * 2 + 0];
    const double lb1 = log_p_b[(size_t)t * 2 + 1];
    const double pi0 = weight * log_p_pi[(size_t)t * 2 + 0];
    const double pi1 = weight * log_p_pi[(size_t)t * 2 + 1];
    for (int l = 0; l < L; ++l) {
      for (int b = 0; b < 2; ++b) {
        const double e = emis(t, l, b);
        const double pib = b == 0 ? pi0 : pi1;
        const double hold = dp[(size_t)l * 2 + b] + lb0 + e;
        double from_c = kNegInf, from_i = kNegInf;
        if (l > 0) {
          from_c = dp[(size_t)(l - 1) * 2 + 0] + lb1 + pib + e;
          from_i = dp[(size_t)(l - 1) * 2 + 1] + lb1 + pib + e;
        }
        int8_t best = 0;
        double v = hold;
        if (from_c > v) { v = from_c; best = 1; }
        if (from_i > v) { v = from_i; best = 2; }
        ndp[(size_t)l * 2 + b] = v;
        path[((size_t)t * L + l) * 2 + b] = best;
      }
    }
    std::swap(dp, ndp);
  }

  // backtrace
  int l = L - 1;
  int beta = dp[(size_t)l * 2 + 0] > dp[(size_t)l * 2 + 1] ? 0 : 1;
  for (int t = 0; t < T; ++t) boundary[t] = 0;
  for (int i = 0; i < L; ++i) plvl[i] = 0;
  flvl[T - 1] = beta;
  plvl[l] = beta;
  int cur_md = beta;
  for (int t = T - 1; t > 0; --t) {
    const int8_t p = path[((size_t)t * L + l) * 2 + beta];
    if (p == 1) {
      --l;
      boundary[t] = 1;
      cur_md = 0;
      beta = 0;
    } else if (p == 2) {
      --l;
      boundary[t] = 1;
      cur_md = 1;
      beta = 1;
    }
    flvl[t - 1] = cur_md;
  }
  boundary[0] = 1;
  // plvl: labels were assigned when entering each phoneme; reconstruct by a
  // second pass over flvl at boundary frames
  {
    int li = 0;
    for (int t = 0; t < T; ++t) {
      if (boundary[t] == 1) {
        plvl[li] = flvl[t];
        ++li;
      }
    }
  }
}

// Batch: padded arrays, per-utterance true lengths; OpenMP over b.
void mlvae_md_viterbi_batch(const float* log_p_yx, const float* log_p_y,
                            const int32_t* y, const float* log_p_b,
                            const float* log_p_pi, const int32_t* t_lens,
                            const int32_t* l_lens, int32_t B, int32_t T,
                            int32_t L, int32_t N, float weight,
                            int32_t* boundary, int32_t* flvl, int32_t* plvl) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    mlvae_md_viterbi_one(
        log_p_yx + (size_t)b * T * N * 2, log_p_y, y + (size_t)b * L,
        log_p_b + (size_t)b * T * 2, log_p_pi + (size_t)b * T * 2, t_lens[b],
        l_lens[b], N, weight, boundary + (size_t)b * T, flvl + (size_t)b * T,
        plvl + (size_t)b * L);
  }
}

int32_t mlvae_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
