// FFT unit test: FFTComputer vs naive DFT + round trips
// (parity: /root/reference/tests/csrc/test_fft.cc).
#include <cmath>
#include <cstdlib>
#include <vector>

#include "csrc/utils/fft.h"
#include "csrc/utils/log.h"
#include "csrc/utils/math.h"

namespace {

float Rand() { return 2.0f * std::rand() / RAND_MAX - 1.0f; }

void NaiveDFT(const std::vector<float>& re_in,
              const std::vector<float>& im_in, std::vector<float>* re_out,
              std::vector<float>* im_out) {
  int32_t n = static_cast<int32_t>(re_in.size());
  re_out->assign(n, 0.0f);
  im_out->assign(n, 0.0f);
  for (int32_t k = 0; k < n; ++k) {
    double sr = 0, si = 0;
    for (int32_t t = 0; t < n; ++t) {
      double ang = -2.0 * aps::kPi * k * t / n;
      sr += re_in[t] * std::cos(ang) - im_in[t] * std::sin(ang);
      si += re_in[t] * std::sin(ang) + im_in[t] * std::cos(ang);
    }
    (*re_out)[k] = static_cast<float>(sr);
    (*im_out)[k] = static_cast<float>(si);
  }
}

void TestComplexFFT(int32_t n) {
  std::vector<float> re(n), im(n);
  for (int32_t i = 0; i < n; ++i) {
    re[i] = Rand();
    im[i] = Rand();
  }
  std::vector<float> packed(2 * n);
  for (int32_t i = 0; i < n; ++i) {
    packed[2 * i] = re[i];
    packed[2 * i + 1] = im[i];
  }
  aps::FFTComputer fft(n);
  fft.ComplexFFT(packed.data(), 2 * n, false);
  std::vector<float> re_ref, im_ref;
  NaiveDFT(re, im, &re_ref, &im_ref);
  for (int32_t k = 0; k < n; ++k) {
    ASSERT(std::fabs(packed[2 * k] - re_ref[k]) < 1e-2f);
    ASSERT(std::fabs(packed[2 * k + 1] - im_ref[k]) < 1e-2f);
  }
  // inverse round trip (inverse is unscaled: divide by n)
  fft.ComplexFFT(packed.data(), 2 * n, true);
  for (int32_t i = 0; i < n; ++i) {
    ASSERT(std::fabs(packed[2 * i] / n - re[i]) < 1e-4f);
    ASSERT(std::fabs(packed[2 * i + 1] / n - im[i]) < 1e-4f);
  }
  LOG_INFO << "ComplexFFT n=" << n << " ok";
}

void TestRealFFT(int32_t n) {
  std::vector<float> x(n);
  for (int32_t i = 0; i < n; ++i) x[i] = Rand();
  std::vector<float> packed(x);
  aps::FFTComputer fft(n);
  fft.RealFFT(packed.data(), n, false);
  std::vector<float> re_ref, im_ref, zeros(n, 0.0f);
  NaiveDFT(x, zeros, &re_ref, &im_ref);
  // packed layout: [X0.re, XN/2.re, X1.re, X1.im, ...]
  ASSERT(std::fabs(packed[0] - re_ref[0]) < 1e-2f);
  ASSERT(std::fabs(packed[1] - re_ref[n / 2]) < 1e-2f);
  for (int32_t k = 1; k < n / 2; ++k) {
    ASSERT(std::fabs(packed[2 * k] - re_ref[k]) < 1e-2f);
    ASSERT(std::fabs(packed[2 * k + 1] - im_ref[k]) < 1e-2f);
  }
  // inverse round trip (RealFFT invert applies the 1/n scale itself)
  fft.RealFFT(packed.data(), n, true);
  for (int32_t i = 0; i < n; ++i) ASSERT(std::fabs(packed[i] - x[i]) < 1e-4f);
  LOG_INFO << "RealFFT n=" << n << " ok";
}

}  // namespace

int main() {
  std::srand(777);
  for (int32_t n : {8, 64, 256, 512, 1024}) {
    TestComplexFFT(n);
    TestRealFFT(n);
  }
  LOG_INFO << "test-fft passed";
  return 0;
}
