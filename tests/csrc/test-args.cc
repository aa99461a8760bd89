// ArgParser unit test (parity: /root/reference/tests/csrc usage of args.h).
#include <cmath>
#include <string>

#include "csrc/utils/args.h"
#include "csrc/utils/log.h"

int main() {
  aps::ArgParser parser("test parser");
  parser.AddArgument("input", "input file", true);
  parser.AddArgument("output", "output file", true);
  parser.AddArgument("--frame-len", "frame length", false, "512");
  parser.AddArgument("--scale", "scale factor", false, "0.5");
  parser.AddArgument("--verbose", "verbose flag", false, "false");

  const char* argv[] = {"test-args",   "in.wav", "out.wav", "--frame-len",
                        "400",         "--verbose", "true"};
  parser.ReadCommandArgs(7, const_cast<char**>(argv));

  ASSERT(parser.GetStr("input") == "in.wav");
  ASSERT(parser.GetStr("output") == "out.wav");
  ASSERT(parser.GetInt("--frame-len") == 400);
  ASSERT(std::fabs(parser.GetFloat("--scale") - 0.5f) < 1e-6f);
  ASSERT(parser.GetBool("--verbose"));
  LOG_INFO << "test-args passed";
  return 0;
}
