// Small math helpers (parity: /root/reference/csrc/utils/math.h).
#ifndef APS_TPU_CSRC_UTILS_MATH_H_
#define APS_TPU_CSRC_UTILS_MATH_H_

#include <cmath>
#include <cstdint>
#include <vector>

namespace aps {

constexpr float kEpsilon = 1.1920929e-07f;
constexpr double kPi = 3.14159265358979323846;

// round up to the next power of two
int32_t RoundUpToNearestPowerOfTwo(int32_t n);

// log2 of a power of two
int32_t Log2PowerOfTwo(int32_t n);

// mean square of a vector
float MeanSquare(const float* data, int32_t n);

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_MATH_H_
