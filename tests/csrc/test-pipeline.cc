// Pipeline stage tests: FrameSplitter / SpectrogramStage / ContextQueue
// (parity: /root/reference/tests/csrc/test_pipeline.cc).
#include <cmath>
#include <cstdlib>
#include <vector>

#include "csrc/base/pipeline.h"
#include "csrc/utils/log.h"

namespace {

void TestFrameSplitter() {
  const int32_t frame_len = 8, frame_hop = 4;
  aps::FrameSplitter splitter(frame_len, frame_hop);
  std::vector<float> x(100);
  for (int32_t i = 0; i < 100; ++i) x[i] = static_cast<float>(i);
  // feed in uneven chunks
  splitter.Process(x.data(), 13);
  splitter.Process(x.data() + 13, 87);
  int32_t expect = (100 - frame_len) / frame_hop + 1;
  ASSERT(splitter.NumFrames() == expect);
  std::vector<float> frame(frame_len);
  int32_t idx = 0;
  while (splitter.Pop(frame.data())) {
    for (int32_t i = 0; i < frame_len; ++i)
      ASSERT(frame[i] == static_cast<float>(idx * frame_hop + i));
    ++idx;
  }
  ASSERT(idx == expect);
  LOG_INFO << "FrameSplitter ok";
}

void TestSpectrogram() {
  aps::SpectrogramStage stage(512, 256, "sqrthann");
  ASSERT(stage.num_bins() == 257);
  std::vector<float> x(4096);
  for (int32_t i = 0; i < 4096; ++i)
    x[i] = std::sin(2.0 * M_PI * 1000.0 * i / 16000.0);
  stage.Process(x.data(), 4096);
  std::vector<float> spec(stage.fft_size());
  int32_t frames = 0;
  while (stage.Pop(spec.data())) {
    // 1 kHz sine at 16 kHz / 512-point FFT -> peak at bin 32
    float peak = 0;
    int32_t peak_bin = -1;
    for (int32_t k = 1; k < 256; ++k) {
      float m = spec[2 * k] * spec[2 * k] + spec[2 * k + 1] * spec[2 * k + 1];
      if (m > peak) {
        peak = m;
        peak_bin = k;
      }
    }
    ASSERT(peak_bin == 32);
    ++frames;
  }
  ASSERT(frames == (4096 - 512) / 256 + 1);
  LOG_INFO << "SpectrogramStage ok";
}

void TestContextQueue() {
  const int32_t dim = 3, lctx = 2, rctx = 1;
  aps::ContextQueue ctx(dim, lctx, rctx);
  std::vector<float> block;
  for (int32_t t = 0; t < 6; ++t) {
    std::vector<float> f(dim, static_cast<float>(t));
    ctx.Process(f.data());
    if (t < rctx) ASSERT(!ctx.Ready());
  }
  // first block: left context replicates frame 0 -> [0 0 0 1]
  ASSERT(ctx.Pop(&block));
  ASSERT(static_cast<int32_t>(block.size()) == (lctx + 1 + rctx) * dim);
  float expect0[] = {0, 0, 0, 1};
  for (int32_t t = 0; t < 4; ++t)
    for (int32_t d = 0; d < dim; ++d)
      ASSERT(block[t * dim + d] == expect0[t]);
  // second block: [0 0 1 2]
  ASSERT(ctx.Pop(&block));
  float expect1[] = {0, 0, 1, 2};
  for (int32_t t = 0; t < 4; ++t)
    for (int32_t d = 0; d < dim; ++d)
      ASSERT(block[t * dim + d] == expect1[t]);
  LOG_INFO << "ContextQueue ok";
}

}  // namespace

int main() {
  TestFrameSplitter();
  TestSpectrogram();
  TestContextQueue();
  LOG_INFO << "test-pipeline passed";
  return 0;
}
