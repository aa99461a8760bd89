#include "csrc/base/pipeline.h"

#include "csrc/utils/log.h"

namespace aps {

void FrameSplitter::Process(const float* samples, int32_t num_samples) {
  for (int32_t i = 0; i < num_samples; ++i) stream_.push_back(samples[i]);
}

int32_t FrameSplitter::NumFrames() const {
  int64_t avail = static_cast<int64_t>(stream_.size());
  if (avail < frame_len_) return 0;
  return static_cast<int32_t>((avail - frame_len_) / frame_hop_ + 1);
}

bool FrameSplitter::Pop(float* frame) {
  if (NumFrames() == 0) return false;
  for (int32_t i = 0; i < frame_len_; ++i) frame[i] = stream_[i];
  for (int32_t i = 0; i < frame_hop_; ++i) stream_.pop_front();
  return true;
}

bool SpectrogramStage::Pop(float* stft) {
  frame_.resize(stft_.win_length());
  if (!splitter_.Pop(frame_.data())) return false;
  stft_.Compute(frame_.data(), stft_.win_length(), stft);
  return true;
}

void ContextQueue::Process(const float* feature) {
  queue_.emplace_back(feature, feature + dim_);
  if (!primed_ && static_cast<int32_t>(queue_.size()) == rctx_ + 1) {
    // replicate first frame as left context (zero-latency warmup)
    for (int32_t i = 0; i < lctx_; ++i)
      queue_.push_front(queue_.front());
    primed_ = true;
  }
}

bool ContextQueue::Ready() const {
  return primed_ &&
         static_cast<int32_t>(queue_.size()) >= lctx_ + 1 + rctx_;
}

bool ContextQueue::Pop(std::vector<float>* block) {
  if (!Ready()) return false;
  int32_t window = lctx_ + 1 + rctx_;
  block->resize(static_cast<size_t>(window) * dim_);
  for (int32_t t = 0; t < window; ++t)
    std::copy(queue_[t].begin(), queue_[t].end(),
              block->begin() + static_cast<size_t>(t) * dim_);
  queue_.pop_front();
  return true;
}

}  // namespace aps
