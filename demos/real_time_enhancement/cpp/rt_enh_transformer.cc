// Real-time transformer enhancement demo (parity:
// /root/reference/demos/real_time_enhancement/cpp/rt_enh_transformer.cc).
#include <vector>

#include "csrc/enh/transformer.h"
#include "csrc/utils/args.h"
#include "csrc/utils/log.h"
#include "csrc/utils/timer.h"
#include "csrc/utils/wav.h"

int main(int argc, char* argv[]) {
  aps::ArgParser parser("Real-time transformer speech enhancement");
  parser.AddArgument("noisy", "input noisy wav", true);
  parser.AddArgument("enhan", "output enhanced wav", true);
  parser.AddArgument("--checkpoint", "model checkpoint directory", true);
  parser.AddArgument("--frame-len", "frame length", false, "512");
  parser.AddArgument("--frame-hop", "frame hop", false, "256");
  parser.AddArgument("--window", "window function", false, "sqrthann");
  parser.AddArgument("--chunk", "processing chunk (samples)", false,
                     "16000");
  parser.AddArgument("--att-chunk", "attention chunk (frames)", false, "1");
  parser.AddArgument("--att-lctx", "attention left context", false, "3");
  parser.AddArgument("--complex-mask", "use complex masks", false, "true");
  parser.ReadCommandArgs(argc, argv);

  aps::TransformerOpts opts;
  opts.frame_len = parser.GetInt("--frame-len");
  opts.frame_hop = parser.GetInt("--frame-hop");
  opts.window = parser.GetStr("--window");
  opts.cpt_dir = parser.GetStr("--checkpoint");
  opts.chunk = parser.GetInt("--att-chunk");
  opts.att_lctx = parser.GetInt("--att-lctx");
  opts.complex_mask = parser.GetBool("--complex-mask");
  aps::TransformerNet nnet(opts);

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
