// Binary IO helpers (parity: /root/reference/csrc/utils/io.{h,cc}).
#ifndef APS_TPU_CSRC_UTILS_IO_H_
#define APS_TPU_CSRC_UTILS_IO_H_

#include <cstdint>
#include <fstream>
#include <string>
#include <vector>

namespace aps {

// read a whole binary file into a byte vector
bool ReadBinaryFile(const std::string& path, std::vector<char>* data);

// write a float matrix (rows x cols) in a simple binary format:
// magic "APSM" + int32 rows + int32 cols + float32 data
bool WriteFloatMatrix(const std::string& path, const float* data,
                      int32_t rows, int32_t cols);
bool ReadFloatMatrix(const std::string& path, std::vector<float>* data,
                     int32_t* rows, int32_t* cols);

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_IO_H_
