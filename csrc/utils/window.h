// Window functions (parity: /root/reference/csrc/utils/window.{h,cc}).
#ifndef APS_TPU_CSRC_UTILS_WINDOW_H_
#define APS_TPU_CSRC_UTILS_WINDOW_H_

#include <cstdint>
#include <string>
#include <vector>

namespace aps {

// Supported: "hann", "sqrthann", "hamm", "rect", "blackman", "bartlett"
// (periodic variants, matching aps_tpu.transform.utils.init_window)
class WindowFunction {
 public:
  static void Generate(const std::string& name, float* window,
                       int32_t window_len);
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_WINDOW_H_
