// Streaming STFT/iSTFT round-trip test
// (parity: /root/reference/tests/csrc/test_stft.cc).
#include <cmath>
#include <cstdlib>
#include <vector>

#include "csrc/utils/log.h"
#include "csrc/utils/stft.h"

namespace {

void TestRoundTrip(int32_t frame_len, int32_t frame_hop,
                   const std::string& window) {
  aps::StreamingSTFT stft(frame_len, frame_hop, window);
  aps::StreamingiSTFT istft(frame_len, frame_hop, window);
  int32_t win_length = stft.win_length();
  int32_t fft_size = stft.fft_size();

  const int32_t num_samples = 16000;
  std::vector<float> x(num_samples);
  for (int32_t i = 0; i < num_samples; ++i)
    x[i] = 0.5f * std::sin(2.0 * M_PI * 440.0 * i / 16000.0) +
           0.1f * (2.0f * std::rand() / RAND_MAX - 1.0f);

  std::vector<float> spec(fft_size), hop(frame_hop), recon;
  for (int32_t start = 0; start + win_length <= num_samples;
       start += frame_hop) {
    stft.Compute(x.data() + start, win_length, spec.data());
    istft.Compute(spec.data(), fft_size, hop.data());
    recon.insert(recon.end(), hop.begin(), hop.end());
  }
  std::vector<float> tail(win_length - frame_hop);
  istft.Flush(tail.data());
  recon.insert(recon.end(), tail.begin(), tail.end());

  // interior samples must reconstruct exactly; skip the first/last
  // win_length where window normalization is partial
  double err = 0, ref = 0;
  for (size_t i = win_length;
       i + win_length < recon.size() && i + win_length < x.size(); ++i) {
    err += (recon[i] - x[i]) * (recon[i] - x[i]);
    ref += x[i] * x[i];
  }
  ASSERT(ref > 0 && err / ref < 1e-6);
  LOG_INFO << "STFT round trip len=" << frame_len << " hop=" << frame_hop
           << " window=" << window << " ok (rel err " << err / ref << ")";
}

}  // namespace

int main() {
  std::srand(777);
  TestRoundTrip(512, 256, "hann");
  TestRoundTrip(512, 256, "sqrthann");
  TestRoundTrip(400, 160, "hann");
  TestRoundTrip(256, 128, "sqrthann");
  LOG_INFO << "test-stft passed";
  return 0;
}
