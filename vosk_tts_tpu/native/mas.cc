// Monotonic Alignment Search — banded Viterbi DP + backtrack, batch-parallel.
//
// Host-side C++ twin of the on-device Pallas/scan implementation
// (vosk_tts_tpu/ops/mas.py), with the same semantics as the reference Cython
// kernel (training/vits2/monotonic_align/core.pyx:7-40). Used for host-side
// tooling (duration extraction over large corpora) and as an independent
// cross-check of the device kernel.
//
// Build: see vosk_tts_tpu/native/build.py (g++ -O3 -shared -fPIC -fopenmp).

#include <algorithm>
#include <cstring>

extern "C" {

// value: (b, t_y, t_x) float32 — log-likelihoods, OVERWRITTEN with DP scores.
// path:  (b, t_y, t_x) int32  — output one-hot alignment.
// t_ys, t_xs: per-batch valid lengths.
void maximum_path_batch(int *path, float *value, const int *t_ys, const int *t_xs,
                        int b, int max_ty, int max_tx) {
  const float NEG = -1e9f;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    float *v = value + (long)i * max_ty * max_tx;
    int *p = path + (long)i * max_ty * max_tx;
    const int t_y = t_ys[i], t_x = t_xs[i];

    for (int y = 0; y < t_y; ++y) {
      float *row = v + (long)y * max_tx;
      const float *prev = v + (long)(y - 1) * max_tx;
      const int x_lo = std::max(0, t_x + y - t_y);
      const int x_hi = std::min(t_x, y + 1);
      for (int x = x_lo; x < x_hi; ++x) {
        const float v_cur = (x == y) ? NEG : prev[x];
        const float v_prev = (x == 0) ? (y == 0 ? 0.f : NEG) : prev[x - 1];
        row[x] += std::max(v_prev, v_cur);
      }
    }

    int index = t_x - 1;
    for (int y = t_y - 1; y >= 0; --y) {
      p[(long)y * max_tx + index] = 1;
      const float *prev = v + (long)(y - 1) * max_tx;
      if (index != 0 && (index == y || prev[index] < prev[index - 1])) --index;
    }
  }
}

}  // extern "C"
