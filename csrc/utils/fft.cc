#include "csrc/utils/fft.h"

#include <cmath>

#include "csrc/utils/log.h"
#include "csrc/utils/math.h"

namespace aps {

FFTComputer::FFTComputer(int32_t fft_size) : fft_size_(fft_size) {
  ASSERT(fft_size > 0 && (fft_size & (fft_size - 1)) == 0);
  cos_table_.resize(fft_size / 2);
  sin_table_.resize(fft_size / 2);
  for (int32_t i = 0; i < fft_size / 2; ++i) {
    cos_table_[i] = static_cast<float>(std::cos(2 * kPi * i / fft_size));
    sin_table_[i] = static_cast<float>(std::sin(2 * kPi * i / fft_size));
  }
  scratch_.resize(2 * fft_size);
}

void FFTComputer::BitReverse(float* data, int32_t n) {
  for (int32_t i = 1, j = 0; i < n; ++i) {
    int32_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(data[2 * i], data[2 * j]);
      std::swap(data[2 * i + 1], data[2 * j + 1]);
    }
  }
}

void FFTComputer::ComplexFFT(float* cplx, int32_t num_values, bool invert) {
  int32_t n = num_values / 2;
  ASSERT(n == fft_size_);
  BitReverse(cplx, n);
  for (int32_t len = 2; len <= n; len <<= 1) {
    int32_t step = n / len;
    for (int32_t i = 0; i < n; i += len) {
      for (int32_t k = 0; k < len / 2; ++k) {
        int32_t tw = k * step;
        float wr = cos_table_[tw];
        float wi = invert ? sin_table_[tw] : -sin_table_[tw];
        float ur = cplx[2 * (i + k)];
        float ui = cplx[2 * (i + k) + 1];
        float vr = cplx[2 * (i + k + len / 2)];
        float vi = cplx[2 * (i + k + len / 2) + 1];
        float tr = vr * wr - vi * wi;
        float ti = vr * wi + vi * wr;
        cplx[2 * (i + k)] = ur + tr;
        cplx[2 * (i + k) + 1] = ui + ti;
        cplx[2 * (i + k + len / 2)] = ur - tr;
        cplx[2 * (i + k + len / 2) + 1] = ui - ti;
      }
    }
  }
}

void FFTComputer::RealFFT(float* real_values, int32_t num_samples,
                          bool invert) {
  ASSERT(num_samples == fft_size_);
  if (!invert) {
    // forward: treat as complex with zero imag
    for (int32_t i = 0; i < fft_size_; ++i) {
      scratch_[2 * i] = real_values[i];
      scratch_[2 * i + 1] = 0.0f;
    }
    ComplexFFT(scratch_.data(), 2 * fft_size_, false);
    real_values[0] = scratch_[0];                   // X[0].re
    real_values[1] = scratch_[fft_size_];           // X[N/2].re
    for (int32_t k = 1; k < fft_size_ / 2; ++k) {
      real_values[2 * k] = scratch_[2 * k];
      real_values[2 * k + 1] = scratch_[2 * k + 1];
    }
  } else {
    // inverse: rebuild the conjugate-symmetric spectrum, IDFT, scale 1/N
    scratch_[0] = real_values[0];
    scratch_[1] = 0.0f;
    scratch_[fft_size_] = real_values[1];
    scratch_[fft_size_ + 1] = 0.0f;
    for (int32_t k = 1; k < fft_size_ / 2; ++k) {
      scratch_[2 * k] = real_values[2 * k];
      scratch_[2 * k + 1] = real_values[2 * k + 1];
      scratch_[2 * (fft_size_ - k)] = real_values[2 * k];
      scratch_[2 * (fft_size_ - k) + 1] = -real_values[2 * k + 1];
    }
    ComplexFFT(scratch_.data(), 2 * fft_size_, true);
    for (int32_t i = 0; i < fft_size_; ++i)
      real_values[i] = scratch_[2 * i] / fft_size_;
  }
}

}  // namespace aps
