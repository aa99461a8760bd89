// Command-line argument parser (parity: /root/reference/csrc/utils/args.h).
#ifndef APS_TPU_CSRC_UTILS_ARGS_H_
#define APS_TPU_CSRC_UTILS_ARGS_H_

#include <map>
#include <string>
#include <vector>

namespace aps {

class ArgParser {
 public:
  explicit ArgParser(const std::string& description);

  void AddArgument(const std::string& name, const std::string& help,
                   bool required = false, const std::string& def = "");
  void ReadCommandArgs(int argc, char* argv[]);

  std::string GetStr(const std::string& name) const;
  int32_t GetInt(const std::string& name) const;
  float GetFloat(const std::string& name) const;
  bool GetBool(const std::string& name) const;

  void PrintUsage() const;

 private:
  struct Option {
    std::string help;
    std::string value;
    bool required;
    bool given = false;
  };
  std::string description_, program_;
  std::vector<std::string> order_;
  std::map<std::string, Option> options_;
  std::vector<std::string> positional_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_UTILS_ARGS_H_
