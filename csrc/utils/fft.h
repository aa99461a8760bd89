// Iterative radix-2 FFT with precomputed twiddle tables.
// Parity surface: /root/reference/csrc/utils/fft.{h,cc} (FFTComputer).
// Layout convention (matches the reference): real FFT of N samples stores
// the spectrum in-place as
//   data[0] = X[0].re, data[1] = X[N/2].re,
//   data[2k] = X[k].re, data[2k+1] = X[k].im   (1 <= k < N/2)
#ifndef APS_TPU_CSRC_UTILS_FFT_H_
#define APS_TPU_CSRC_UTILS_FFT_H_

#include <cstdint>
#include <vector>

namespace aps {

class FFTComputer {
 public:
  explicit FFTComputer(int32_t fft_size);

  int32_t fft_size() const { return fft_size_; }

  // in-place complex FFT over interleaved (re, im) pairs;
  // num_values = 2 * fft_size. invert=true computes the unscaled IDFT.
  void ComplexFFT(float* cplx_values, int32_t num_values,
                  bool invert = false);

  // in-place real FFT of fft_size samples (packed layout above)
  void RealFFT(float* real_values, int32_t num_samples,
               bool invert = false);

 private:
  void BitReverse(float* data, int32_t n);
  int32_t fft_size_;
  std::vector<float> cos_table_;
  std::vector<float> sin_table_;
  std::vector<float> scratch_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_FFT_H_
