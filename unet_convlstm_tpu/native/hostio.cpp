// hostio — native host-side input-pipeline kernels.
//
// The per-step host work of the training loop is "gather B sequences by
// index and convert [N,T,C,H,W] -> [B,T,H,W,C]" (data/npz_dataset.py
// get_batch_raw). numpy does this as two full passes (fancy-index copy,
// then moveaxis copy); this kernel does one fused cache-blocked pass,
// optionally multithreaded, writing straight into the destination buffer
// that jax.device_put consumes. Exposed through ctypes
// (data/fast_gather.py); built by native/build.py with g++ -O3.
//
// The reference has no first-party native code (SURVEY.md §2: all its
// native perf is third-party cuDNN/Mitsuba/OpenCV); this is the
// framework-runtime equivalent for the TPU stack's host side.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// src:  [N, T, C, H, W] float32, C-contiguous
// idx:  [B] int64 sample indices
// dst:  [B, T, H, W, C] float32, C-contiguous (preallocated)
void gather_transpose_f32(const float* src, const int64_t* idx, float* dst,
                          int64_t B, int64_t T, int64_t C, int64_t H,
                          int64_t W, int32_t nthreads) {
  const int64_t hw = H * W;
  const int64_t src_frame = C * hw;     // one [C,H,W] frame
  const int64_t src_seq = T * src_frame;
  const int64_t dst_frame = hw * C;     // one [H,W,C] frame
  const int64_t dst_seq = T * dst_frame;
  const int64_t jobs = B * T;

  auto work = [&](int64_t j0, int64_t j1) {
    for (int64_t j = j0; j < j1; ++j) {
      const int64_t b = j / T;
      const int64_t t = j % T;
      const float* s = src + idx[b] * src_seq + t * src_frame;
      float* d = dst + b * dst_seq + t * dst_frame;
      if (C == 1) {  // pure copy
        std::memcpy(d, s, sizeof(float) * hw);
        continue;
      }
      // blocked over the pixel axis so C source planes stay in cache
      constexpr int64_t BLK = 512;
      for (int64_t p0 = 0; p0 < hw; p0 += BLK) {
        const int64_t p1 = (p0 + BLK < hw) ? p0 + BLK : hw;
        for (int64_t c = 0; c < C; ++c) {
          const float* sc = s + c * hw;
          for (int64_t p = p0; p < p1; ++p) {
            d[p * C + c] = sc[p];
          }
        }
      }
    }
  };

  if (nthreads <= 1 || jobs < 2) {
    work(0, jobs);
    return;
  }
  const int nt = static_cast<int>(nthreads < jobs ? nthreads : jobs);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  const int64_t per = (jobs + nt - 1) / nt;
  for (int i = 0; i < nt; ++i) {
    const int64_t j0 = i * per;
    const int64_t j1 = (j0 + per < jobs) ? j0 + per : jobs;
    if (j0 >= j1) break;
    threads.emplace_back(work, j0, j1);
  }
  for (auto& th : threads) th.join();
}

// Moving-MNIST frame paste: digit-pixel overwrite into the sequence frame
// plus velocity accumulation (the generator's inner loop,
// data/moving_mnist.py). frame/vel: [S, S]; digit: [28, 28] in [0,1].
void paste_digit_f32(float* frame, float* vel, const float* digit,
                     int64_t S, int64_t y, int64_t x, float vx) {
  for (int64_t r = 0; r < 28; ++r) {
    float* fr = frame + (y + r) * S + x;
    float* vr = vel + (y + r) * S + x;
    const float* dr = digit + r * 28;
    for (int64_t c = 0; c < 28; ++c) {
      if (dr[c] > 0.0f) {
        fr[c] = dr[c];
        vr[c] += vx;
      }
    }
  }
}

}  // extern "C"
