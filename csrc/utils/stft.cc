#include "csrc/utils/stft.h"

#include <cstring>

#include "csrc/utils/log.h"
#include "csrc/utils/math.h"
#include "csrc/utils/window.h"

namespace aps {

STFTBase::STFTBase(int32_t frame_len, int32_t frame_hop,
                   const std::string& window, const std::string& mode)
    : frame_len_(frame_len), frame_hop_(frame_hop) {
  fft_size_ = RoundUpToNearestPowerOfTwo(frame_len);
  // librosa mode: window center-padded to fft_size, frames fft_size long;
  // kaldi mode: frame_len window, zero-pad at the tail
  win_length_ = (mode == "kaldi") ? frame_len : fft_size_;
  window_.resize(win_length_, 0.0f);
  if (mode == "kaldi") {
    WindowFunction::Generate(window, window_.data(), frame_len);
  } else {
    int32_t lpad = (fft_size_ - frame_len) / 2;
    std::vector<float> w(frame_len);
    WindowFunction::Generate(window, w.data(), frame_len);
    std::memcpy(window_.data() + lpad, w.data(),
                sizeof(float) * frame_len);
  }
  fft_ = std::make_unique<FFTComputer>(fft_size_);
  buffer_.resize(fft_size_);
}

void StreamingSTFT::Compute(const float* frame, int32_t frame_len,
                            float* stft) {
  ASSERT(frame_len == win_length_);
  std::memset(buffer_.data(), 0, sizeof(float) * fft_size_);
  for (int32_t i = 0; i < win_length_; ++i)
    buffer_[i] = frame[i] * window_[i];
  fft_->RealFFT(buffer_.data(), fft_size_, false);
  std::memcpy(stft, buffer_.data(), sizeof(float) * fft_size_);
}

StreamingiSTFT::StreamingiSTFT(int32_t frame_len, int32_t frame_hop,
                               const std::string& window,
                               const std::string& mode)
    : STFTBase(frame_len, frame_hop, window, mode) {
  win_sqr_.resize(win_length_);
  for (int32_t i = 0; i < win_length_; ++i)
    win_sqr_[i] = window_[i] * window_[i];
  Reset();
}

void StreamingiSTFT::Reset() {
  int32_t overlap = win_length_ - frame_hop_;
  wav_cache_.assign(overlap, 0.0f);
  win_cache_.assign(overlap, 0.0f);
}

void StreamingiSTFT::Compute(const float* stft, int32_t stft_len,
                             float* frame) {
  ASSERT(stft_len == fft_size_);
  std::memcpy(buffer_.data(), stft, sizeof(float) * fft_size_);
  fft_->RealFFT(buffer_.data(), fft_size_, true);
  std::vector<float> wav(win_length_), win(win_length_);
  for (int32_t i = 0; i < win_length_; ++i) {
    wav[i] = buffer_[i] * window_[i];
    win[i] = win_sqr_[i];
  }
  int32_t overlap = win_length_ - frame_hop_;
  for (int32_t i = 0; i < overlap; ++i) {
    wav[i] += wav_cache_[i];
    win[i] += win_cache_[i];
  }
  for (int32_t i = 0; i < overlap; ++i) {
    wav_cache_[i] = wav[frame_hop_ + i];
    win_cache_[i] = win[frame_hop_ + i];
  }
  for (int32_t i = 0; i < frame_hop_; ++i)
    frame[i] = wav[i] / (win[i] + kEpsilon);
}

void StreamingiSTFT::Flush(float* frame) {
  int32_t overlap = win_length_ - frame_hop_;
  for (int32_t i = 0; i < overlap; ++i)
    frame[i] = wav_cache_[i] / (win_cache_[i] + kEpsilon);
}

}  // namespace aps
