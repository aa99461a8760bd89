// Composable streaming stages: Frame -> STFT -> Feature -> Context queue.
// Parity surface: /root/reference/csrc/base/pipeline.{h,cc} — same stage
// pattern; the nnet stage consumes our exported models instead of
// TorchScript (csrc/base/nnet.h).
#ifndef APS_TPU_CSRC_BASE_PIPELINE_H_
#define APS_TPU_CSRC_BASE_PIPELINE_H_

#include <deque>
#include <memory>
#include <vector>

#include "csrc/utils/stft.h"

namespace aps {

// Splits a continuous sample stream into hop-synchronous frames
class FrameSplitter {
 public:
  FrameSplitter(int32_t frame_len, int32_t frame_hop)
      : frame_len_(frame_len), frame_hop_(frame_hop) {}

  // push samples; frames become available once enough arrived
  void Process(const float* samples, int32_t num_samples);
  // number of complete frames ready
  int32_t NumFrames() const;
  // pop one frame (frame_len samples); returns false if not ready
  bool Pop(float* frame);
  void Reset() { stream_.clear(); offset_ = 0; }

 private:
  int32_t frame_len_, frame_hop_;
  std::deque<float> stream_;
  int64_t offset_ = 0;
};

// Frame -> packed real FFT spectrum
class SpectrogramStage {
 public:
  SpectrogramStage(int32_t frame_len, int32_t frame_hop,
                   const std::string& window = "sqrthann")
      : splitter_(0, 0), stft_(frame_len, frame_hop, window) {
    splitter_ = FrameSplitter(stft_.win_length(), frame_hop);
  }

  int32_t num_bins() const { return stft_.num_bins(); }
  int32_t fft_size() const { return stft_.fft_size(); }
  int32_t win_length() const { return stft_.win_length(); }

  void Process(const float* samples, int32_t num_samples) {
    splitter_.Process(samples, num_samples);
  }
  int32_t NumFrames() const { return splitter_.NumFrames(); }
  // pop one spectrum frame: fft_size packed values
  bool Pop(float* stft);
  void Reset() { splitter_.Reset(); }

 private:
  FrameSplitter splitter_;
  StreamingSTFT stft_;
  std::vector<float> frame_;
};

// Sliding context window over feature frames (lctx + 1 + rctx)
class ContextQueue {
 public:
  ContextQueue(int32_t dim, int32_t lctx, int32_t rctx)
      : dim_(dim), lctx_(lctx), rctx_(rctx) {}

  void Process(const float* feature);
  // context block ready? (lctx+1+rctx frames centered at the next frame)
  bool Ready() const;
  // pop (lctx+1+rctx) x dim block
  bool Pop(std::vector<float>* block);
  void Reset() { queue_.clear(); primed_ = false; }

 private:
  int32_t dim_, lctx_, rctx_;
  std::deque<std::vector<float>> queue_;
  bool primed_ = false;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_BASE_PIPELINE_H_
