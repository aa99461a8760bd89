#include "csrc/utils/io.h"

#include <cstring>

namespace aps {

bool ReadBinaryFile(const std::string& path, std::vector<char>* data) {
  std::ifstream is(path, std::ios::binary | std::ios::ate);
  if (!is.is_open()) return false;
  std::streamsize size = is.tellg();
  is.seekg(0);
  data->resize(size);
  return static_cast<bool>(is.read(data->data(), size));
}

bool WriteFloatMatrix(const std::string& path, const float* data,
                      int32_t rows, int32_t cols) {
  std::ofstream os(path, std::ios::binary);
  if (!os.is_open()) return false;
  os.write("APSM", 4);
  os.write(reinterpret_cast<const char*>(&rows), 4);
  os.write(reinterpret_cast<const char*>(&cols), 4);
  os.write(reinterpret_cast<const char*>(data),
           sizeof(float) * rows * cols);
  return true;
}

bool ReadFloatMatrix(const std::string& path, std::vector<float>* data,
                     int32_t* rows, int32_t* cols) {
  std::ifstream is(path, std::ios::binary);
  if (!is.is_open()) return false;
  char magic[4];
  is.read(magic, 4);
  if (std::memcmp(magic, "APSM", 4) != 0) return false;
  is.read(reinterpret_cast<char*>(rows), 4);
  is.read(reinterpret_cast<char*>(cols), 4);
  data->resize(static_cast<size_t>(*rows) * (*cols));
  return static_cast<bool>(is.read(reinterpret_cast<char*>(data->data()),
                                   sizeof(float) * data->size()));
}

}  // namespace aps
