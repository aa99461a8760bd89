// Real-time DFSMN enhancement demo: chunked file -> file loop with RTF
// reporting (parity: /root/reference/demos/real_time_enhancement/cpp/
// rt_enh_dfsmn.cc).
#include <vector>

#include "csrc/enh/dfsmn.h"
#include "csrc/utils/args.h"
#include "csrc/utils/log.h"
#include "csrc/utils/timer.h"
#include "csrc/utils/wav.h"

int main(int argc, char* argv[]) {
  aps::ArgParser parser("Real-time DFSMN speech enhancement");
  parser.AddArgument("noisy", "input noisy wav", true);
  parser.AddArgument("enhan", "output enhanced wav", true);
  parser.AddArgument("--checkpoint", "model checkpoint directory", true);
  parser.AddArgument("--frame-len", "frame length", false, "512");
  parser.AddArgument("--frame-hop", "frame hop", false, "256");
  parser.AddArgument("--window", "window function", false, "sqrthann");
  parser.AddArgument("--chunk", "processing chunk (samples)", false,
                     "16000");
  parser.AddArgument("--num-layers", "dfsmn layers", false, "4");
  parser.AddArgument("--lctx", "per-layer left context", false, "3");
  parser.AddArgument("--rctx", "per-layer right context", false, "3");
  parser.AddArgument("--complex-mask", "use complex masks", false, "true");
  parser.ReadCommandArgs(argc, argv);

  aps::DfsmnOpts opts;
  opts.frame_len = parser.GetInt("--frame-len");
  opts.frame_hop = parser.GetInt("--frame-hop");
  opts.window = parser.GetStr("--window");
  opts.cpt_dir = parser.GetStr("--checkpoint");
  opts.num_layers = parser.GetInt("--num-layers");
  opts.layer_lctx = parser.GetInt("--lctx");
  opts.layer_rctx = parser.GetInt("--rctx");
  opts.complex_mask = parser.GetBool("--complex-mask");
  aps::DfsmnNet nnet(opts);

  aps::WavReader reader(parser.GetStr("noisy"));
  ASSERT(reader.NumChannels() == 1);
  aps::WavWriter writer(parser.GetStr("enhan"), reader.SampleRate(), 1);

  int32_t chunk = parser.GetInt("--chunk");
  std::vector<float> buf(chunk), enhanced;
  aps::Timer timer;
  double total_sec =
      static_cast<double>(reader.NumFrames()) / reader.SampleRate();
  while (!reader.Done()) {
    uint32_t n = reader.Read(buf.data(), chunk);
    enhanced.clear();
    nnet.Process(buf.data(), n, &enhanced);
    if (!enhanced.empty()) writer.Write(enhanced.data(), enhanced.size());
  }
  enhanced.clear();
  nnet.Flush(&enhanced);
  if (!enhanced.empty()) writer.Write(enhanced.data(), enhanced.size());
  writer.Close();
  double cost = timer.Elapsed();
  LOG_INFO << "Processed " << total_sec << "s audio in " << cost
           << "s, RTF = " << cost / total_sec;
  return 0;
}
