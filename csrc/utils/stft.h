// Streaming STFT/iSTFT over the radix-2 FFT.
// Parity surface: /root/reference/csrc/utils/stft.{h,cc}
// (STFTBase/StreamingSTFT/StreamingiSTFT) — matches
// aps_tpu/transform/streaming.py numerically (librosa mode, rfft framing).
#ifndef APS_TPU_CSRC_UTILS_STFT_H_
#define APS_TPU_CSRC_UTILS_STFT_H_

#include <memory>
#include <string>
#include <vector>

#include "csrc/utils/fft.h"

namespace aps {

class STFTBase {
 public:
  STFTBase(int32_t frame_len, int32_t frame_hop,
           const std::string& window = "hann",
           const std::string& mode = "librosa");

  int32_t frame_len() const { return frame_len_; }
  int32_t frame_hop() const { return frame_hop_; }
  int32_t fft_size() const { return fft_size_; }
  int32_t win_length() const { return win_length_; }
  int32_t num_bins() const { return fft_size_ / 2 + 1; }

 protected:
  int32_t frame_len_, frame_hop_, fft_size_, win_length_;
  std::vector<float> window_;
  std::unique_ptr<FFTComputer> fft_;
  std::vector<float> buffer_;
};

class StreamingSTFT : public STFTBase {
 public:
  using STFTBase::STFTBase;
  // frame: win_length samples -> stft: fft_size packed real-FFT values
  // (FFTComputer::RealFFT layout)
  void Compute(const float* frame, int32_t frame_len, float* stft);
};

class StreamingiSTFT : public STFTBase {
 public:
  StreamingiSTFT(int32_t frame_len, int32_t frame_hop,
                 const std::string& window = "hann",
                 const std::string& mode = "librosa");
  void Reset();
  // stft: fft_size packed spectrum values -> frame: frame_hop samples
  void Compute(const float* stft, int32_t stft_len, float* frame);
  // remaining (win_length - frame_hop) samples
  void Flush(float* frame);

 private:
  std::vector<float> wav_cache_;
  std::vector<float> win_cache_;
  std::vector<float> win_sqr_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_STFT_H_
