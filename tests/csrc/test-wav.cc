// WAV reader/writer round-trip test
// (parity: /root/reference/tests/csrc/test_wav.cc).
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "csrc/utils/log.h"
#include "csrc/utils/wav.h"

int main() {
  std::srand(777);
  const char* path = "/tmp/aps_test_wav.wav";
  const uint32_t sr = 16000, n = 32000;
  std::vector<float> x(n);
  for (uint32_t i = 0; i < n; ++i)
    x[i] = 0.9f * (2.0f * std::rand() / RAND_MAX - 1.0f);

  {
    aps::WavWriter writer(path, sr, 1);
    // write in uneven chunks
    uint32_t done = 0;
    while (done < n) {
      uint32_t chunk = std::min<uint32_t>(4097, n - done);
      writer.Write(x.data() + done, chunk);
      done += chunk;
    }
    writer.Close();
  }

  aps::WavReader reader(path);
  ASSERT(reader.SampleRate() == sr);
  ASSERT(reader.NumChannels() == 1);
  ASSERT(reader.NumFrames() == n);
  std::vector<float> y;
  std::vector<float> buf(1000);
  while (!reader.Done()) {
    uint32_t got = reader.Read(buf.data(), 1000);
    y.insert(y.end(), buf.begin(), buf.begin() + got);
  }
  ASSERT(y.size() == n);
  for (uint32_t i = 0; i < n; ++i)
    ASSERT(std::fabs(y[i] - x[i]) < 2.0f / 32768);
  std::remove(path);
  LOG_INFO << "test-wav passed";
  return 0;
}
