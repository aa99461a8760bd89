// Wall-clock timer (parity: /root/reference/csrc/utils/timer.h) — used for
// RTF reporting in the real-time demos.
#ifndef APS_TPU_CSRC_UTILS_TIMER_H_
#define APS_TPU_CSRC_UTILS_TIMER_H_

#include <chrono>

namespace aps {

class Timer {
 public:
  Timer() { Reset(); }
  void Reset() { start_ = std::chrono::steady_clock::now(); }
  // elapsed seconds
  double Elapsed() const {
    auto now = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(now - start_).count();
  }

 private:
  std::chrono::steady_clock::time_point start_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_TIMER_H_
