#include "csrc/utils/window.h"

#include <cmath>

#include "csrc/utils/log.h"
#include "csrc/utils/math.h"

namespace aps {

void WindowFunction::Generate(const std::string& name, float* window,
                              int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    double x = 2 * kPi * i / n;  // periodic windows
    if (name == "hann") {
      window[i] = static_cast<float>(0.5 - 0.5 * std::cos(x));
    } else if (name == "sqrthann") {
      window[i] = static_cast<float>(std::sqrt(0.5 - 0.5 * std::cos(x)));
    } else if (name == "hamm") {
      window[i] = static_cast<float>(0.54 - 0.46 * std::cos(x));
    } else if (name == "blackman") {
      window[i] = static_cast<float>(0.42 - 0.5 * std::cos(x) +
                                     0.08 * std::cos(2 * x));
    } else if (name == "bartlett") {
      double v = 2.0 * i / n;
      window[i] = static_cast<float>(v <= 1.0 ? v : 2.0 - v);
    } else if (name == "rect") {
      window[i] = 1.0f;
    } else {
      LOG_FAIL << "Unknown window: " << name;
    }
  }
}

}  // namespace aps
