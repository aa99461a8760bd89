#include "csrc/utils/math.h"

#include "csrc/utils/log.h"

namespace aps {

int32_t RoundUpToNearestPowerOfTwo(int32_t n) {
  ASSERT(n > 0);
  int32_t v = 1;
  while (v < n) v <<= 1;
  return v;
}

int32_t Log2PowerOfTwo(int32_t n) {
  ASSERT(n > 0 && (n & (n - 1)) == 0);
  int32_t l = 0;
  while ((1 << l) < n) ++l;
  return l;
}

float MeanSquare(const float* data, int32_t n) {
  double acc = 0;
  for (int32_t i = 0; i < n; ++i) acc += data[i] * data[i];
  return static_cast<float>(acc / n);
}

}  // namespace aps
