// Offline single-channel speech enhancement with an exported DCUNet:
// whole-utterance wave in -> enhanced wave out through the native runtime.
// Parity surface: /root/reference/examples/sse/torchscript_dcunet/
// dcunet-enhan.cc (which consumed a traced libtorch model); here the model
// checkpoint is executed through the deployment executor
// (csrc/base/nnet.h PySeparator -> aps_tpu.deploy.RtSeparator), so any
// registered sse@* model with an `infer` method works, not just DCUNet.
#include <vector>

#include "csrc/base/nnet.h"
#include "csrc/utils/args.h"
#include "csrc/utils/log.h"
#include "csrc/utils/timer.h"
#include "csrc/utils/wav.h"

int main(int argc, char* argv[]) {
  aps::ArgParser parser("Offline DCUNet speech enhancement");
  parser.AddArgument("noisy", "input noisy wav", true);
  parser.AddArgument("enhan", "output enhanced wav", true);
  parser.AddArgument("--checkpoint", "model checkpoint directory", true);
  parser.AddArgument("--tag", "checkpoint tag (best|last)", false, "best");
  parser.ReadCommandArgs(argc, argv);

  aps::WavReader reader(parser.GetStr("noisy"));
  ASSERT(reader.NumChannels() == 1);
  std::vector<float> noisy(reader.NumFrames());
  uint32_t n = reader.Read(noisy.data(), noisy.size());
  ASSERT(n == noisy.size());

  aps::PySeparator nnet(parser.GetStr("--checkpoint"),
                        parser.GetStr("--tag"));
  std::vector<float> enhanced;
  std::vector<int64_t> shape;
  aps::Timer timer;
  if (!nnet.Enhance(noisy.data(), noisy.size(), &enhanced, &shape))
    LOG_FAIL << "Enhancement failed";
  double cost = timer.Elapsed();

  // multi-branch models return (num_spks, S); keep the first source
  int64_t num_samples = shape.back();
  aps::WavWriter writer(parser.GetStr("enhan"), reader.SampleRate(), 1);
  writer.Write(enhanced.data(), num_samples);
  writer.Close();

  double total_sec =
      static_cast<double>(noisy.size()) / reader.SampleRate();
  LOG_INFO << "Enhanced " << total_sec << "s audio in " << cost
           << "s, RTF = " << cost / total_sec;
  return 0;
}
