#include "csrc/utils/wav.h"

#include <algorithm>
#include <cstring>

#include "csrc/utils/log.h"

namespace aps {

namespace {

template <typename T>
void ReadBin(std::ifstream& is, T* value) {
  is.read(reinterpret_cast<char*>(value), sizeof(T));
}

template <typename T>
void WriteBin(std::ofstream& os, T value) {
  os.write(reinterpret_cast<const char*>(&value), sizeof(T));
}

}  // namespace

WavReader::WavReader(const std::string& filename) {
  is_.open(filename, std::ios::binary);
  if (!is_.is_open()) LOG_FAIL << "Can not open " << filename;
  char tag[4];
  is_.read(tag, 4);
  ASSERT(std::memcmp(tag, "RIFF", 4) == 0);
  uint32_t riff_size;
  ReadBin(is_, &riff_size);
  is_.read(tag, 4);
  ASSERT(std::memcmp(tag, "WAVE", 4) == 0);
  // chunk walk
  while (true) {
    is_.read(tag, 4);
    uint32_t size;
    ReadBin(is_, &size);
    if (!is_.good()) LOG_FAIL << "Missing data chunk in " << filename;
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt, channels, block, bits;
      uint32_t sr, byte_rate;
      ReadBin(is_, &fmt);
      ReadBin(is_, &channels);
      ReadBin(is_, &sr);
      ReadBin(is_, &byte_rate);
      ReadBin(is_, &block);
      ReadBin(is_, &bits);
      ASSERT(fmt == 1 && bits == 16);
      header_.format = fmt;
      header_.num_channels = channels;
      header_.sample_rate = sr;
      header_.bits = bits;
      if (size > 16) is_.seekg(size - 16, std::ios::cur);
    } else if (std::memcmp(tag, "data", 4) == 0) {
      header_.num_frames = size / (header_.num_channels * 2);
      break;
    } else {
      is_.seekg(size + (size & 1), std::ios::cur);
    }
  }
}

WavReader::~WavReader() = default;

uint32_t WavReader::Read(float* data, uint32_t num_frames) {
  uint32_t todo = std::min(num_frames, FramesRemain());
  if (todo == 0) return 0;
  uint32_t values = todo * header_.num_channels;
  cache_.resize(values);
  is_.read(reinterpret_cast<char*>(cache_.data()), values * 2);
  // interleaved -> channel-major
  for (uint32_t c = 0; c < header_.num_channels; ++c)
    for (uint32_t t = 0; t < todo; ++t)
      data[c * todo + t] =
          cache_[t * header_.num_channels + c] / 32768.0f;
  read_ += todo;
  return todo;
}

WavWriter::WavWriter(const std::string& filename, uint32_t sample_rate,
                     uint16_t num_channels) {
  os_.open(filename, std::ios::binary);
  if (!os_.is_open()) LOG_FAIL << "Can not create " << filename;
  header_.sample_rate = sample_rate;
  header_.num_channels = num_channels;
  WriteHeader();
}

void WavWriter::WriteHeader() {
  os_.seekp(0);
  uint32_t data_bytes = written_ * header_.num_channels * 2;
  os_.write("RIFF", 4);
  WriteBin<uint32_t>(os_, 36 + data_bytes);
  os_.write("WAVE", 4);
  os_.write("fmt ", 4);
  WriteBin<uint32_t>(os_, 16);
  WriteBin<uint16_t>(os_, 1);
  WriteBin<uint16_t>(os_, header_.num_channels);
  WriteBin<uint32_t>(os_, header_.sample_rate);
  WriteBin<uint32_t>(os_, header_.sample_rate * header_.num_channels * 2);
  WriteBin<uint16_t>(os_, header_.num_channels * 2);
  WriteBin<uint16_t>(os_, 16);
  os_.write("data", 4);
  WriteBin<uint32_t>(os_, data_bytes);
}

void WavWriter::Write(const float* data, uint32_t num_frames) {
  uint32_t values = num_frames * header_.num_channels;
  cache_.resize(values);
  for (uint32_t c = 0; c < header_.num_channels; ++c)
    for (uint32_t t = 0; t < num_frames; ++t) {
      float v = data[c * num_frames + t] * 32768.0f;
      v = std::max(-32768.0f, std::min(32767.0f, v));
      cache_[t * header_.num_channels + c] = static_cast<int16_t>(v);
    }
  os_.write(reinterpret_cast<const char*>(cache_.data()), values * 2);
  written_ += num_frames;
}

void WavWriter::Close() {
  if (closed_) return;
  WriteHeader();
  os_.close();
  closed_ = true;
}

WavWriter::~WavWriter() { Close(); }

}  // namespace aps
