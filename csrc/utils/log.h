// Logging & assert macros for the deployment runtime.
// Parity surface: /root/reference/csrc/utils/log.h (LOG_INFO/LOG_WARN/
// LOG_FAIL/ASSERT), re-implemented for the TPU-era runtime.
#ifndef APS_TPU_CSRC_UTILS_LOG_H_
#define APS_TPU_CSRC_UTILS_LOG_H_

#include <cstdlib>
#include <ctime>
#include <iostream>
#include <sstream>
#include <string>

namespace aps {

enum class LogLevel { kInfo, kWarn, kFail };

class LogMessage {
 public:
  LogMessage(LogLevel level, const char* file, int line) : level_(level) {
    char buf[32];
    std::time_t now = std::time(nullptr);
    std::strftime(buf, sizeof(buf), "%Y-%m-%d %H:%M:%S",
                  std::localtime(&now));
    stream_ << "[" << buf << " " << Tag() << " " << file << ":" << line
            << "] ";
  }

  ~LogMessage() {
    std::cerr << stream_.str() << std::endl;
    if (level_ == LogLevel::kFail) std::abort();
  }

  std::ostream& stream() { return stream_; }

 private:
  const char* Tag() const {
    switch (level_) {
      case LogLevel::kInfo: return "INFO";
      case LogLevel::kWarn: return "WARN";
      default: return "FAIL";
    }
  }
  LogLevel level_;
  std::ostringstream stream_;
};

}  // namespace aps

#define LOG_INFO \
  ::aps::LogMessage(::aps::LogLevel::kInfo, __FILE__, __LINE__).stream()
#define LOG_WARN \
  ::aps::LogMessage(::aps::LogLevel::kWarn, __FILE__, __LINE__).stream()
#define LOG_FAIL \
  ::aps::LogMessage(::aps::LogLevel::kFail, __FILE__, __LINE__).stream()

#define ASSERT(cond)                                    \
  do {                                                  \
    if (!(cond)) LOG_FAIL << "Assert failed: " #cond;   \
  } while (0)

#endif  // APS_TPU_CSRC_UTILS_LOG_H_
