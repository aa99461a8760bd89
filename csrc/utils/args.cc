#include "csrc/utils/args.h"

#include <cstdlib>
#include <iostream>

#include "csrc/utils/log.h"

namespace aps {

ArgParser::ArgParser(const std::string& description)
    : description_(description) {}

void ArgParser::AddArgument(const std::string& name,
                            const std::string& help, bool required,
                            const std::string& def) {
  options_[name] = Option{help, def, required};
  order_.push_back(name);
}

void ArgParser::ReadCommandArgs(int argc, char* argv[]) {
  program_ = argv[0];
  size_t pos_index = 0;
  std::vector<std::string> pos_names;
  for (const auto& name : order_)
    if (name.rfind("--", 0) != 0) pos_names.push_back(name);
  for (int i = 1; i < argc; ++i) {
    std::string tok = argv[i];
    if (tok == "-h" || tok == "--help") {
      PrintUsage();
      std::exit(0);
    }
    if (tok.rfind("--", 0) == 0) {
      auto it = options_.find(tok);
      if (it == options_.end()) LOG_FAIL << "Unknown option: " << tok;
      if (i + 1 >= argc) LOG_FAIL << "Missing value for " << tok;
      it->second.value = argv[++i];
      it->second.given = true;
    } else {
      if (pos_index >= pos_names.size())
        LOG_FAIL << "Unexpected positional argument: " << tok;
      options_[pos_names[pos_index]].value = tok;
      options_[pos_names[pos_index]].given = true;
      ++pos_index;
    }
  }
  for (const auto& kv : options_)
    if (kv.second.required && !kv.second.given)
      LOG_FAIL << "Missing required argument: " << kv.first;
}

std::string ArgParser::GetStr(const std::string& name) const {
  auto it = options_.find(name);
  ASSERT(it != options_.end());
  return it->second.value;
}

int32_t ArgParser::GetInt(const std::string& name) const {
  return std::stoi(GetStr(name));
}

float ArgParser::GetFloat(const std::string& name) const {
  return std::stof(GetStr(name));
}

bool ArgParser::GetBool(const std::string& name) const {
  std::string v = GetStr(name);
  return v == "true" || v == "1" || v == "yes";
}

void ArgParser::PrintUsage() const {
  std::cerr << description_ << "\nUsage: " << program_ << " [options]\n";
  for (const auto& name : order_) {
    const auto& opt = options_.at(name);
    std::cerr << "  " << name << "\t" << opt.help
              << (opt.required ? " (required)" : "")
              << (opt.value.empty() ? "" : " [default: " + opt.value + "]")
              << "\n";
  }
}

}  // namespace aps
