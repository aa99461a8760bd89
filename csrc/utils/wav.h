// Streaming RIFF/WAVE reader & writer.
// Parity surface: /root/reference/csrc/utils/wav.{h,cc} (WavReader with
// chunked reads, WavWriter). PCM16 payloads, float [-1, 1] samples.
#ifndef APS_TPU_CSRC_UTILS_WAV_H_
#define APS_TPU_CSRC_UTILS_WAV_H_

#include <cstdint>
#include <fstream>
#include <string>
#include <vector>

namespace aps {

struct WavHeader {
  uint16_t format = 1;       // PCM
  uint16_t num_channels = 1;
  uint32_t sample_rate = 16000;
  uint16_t bits = 16;
  uint32_t num_frames = 0;   // samples per channel
};

class WavReader {
 public:
  explicit WavReader(const std::string& filename);
  ~WavReader();

  uint32_t SampleRate() const { return header_.sample_rate; }
  uint16_t NumChannels() const { return header_.num_channels; }
  uint32_t NumFrames() const { return header_.num_frames; }
  uint32_t FramesRemain() const { return header_.num_frames - read_; }
  bool Done() const { return read_ >= header_.num_frames; }

  // read up to num_frames frames (interleaved -> channel-major floats);
  // returns frames actually read
  uint32_t Read(float* data, uint32_t num_frames);

 private:
  std::ifstream is_;
  WavHeader header_;
  uint32_t read_ = 0;
  std::vector<int16_t> cache_;
};

class WavWriter {
 public:
  WavWriter(const std::string& filename, uint32_t sample_rate,
            uint16_t num_channels);
  ~WavWriter();

  // write num_frames frames of float samples in [-1, 1]
  void Write(const float* data, uint32_t num_frames);
  void Close();

 private:
  void WriteHeader();
  std::ofstream os_;
  WavHeader header_;
  uint32_t written_ = 0;
  bool closed_ = false;
  std::vector<int16_t> cache_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_WAV_H_
