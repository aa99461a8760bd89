// Streaming DFSMN enhancement driver (parity:
// /root/reference/csrc/enh/dfsmn.{h,cc}): stft -> feature context ->
// nnet -> mask -> iSTFT, matching aps_tpu/rt_sse/enh/dfsmn.py.
#ifndef APS_TPU_CSRC_ENH_DFSMN_H_
#define APS_TPU_CSRC_ENH_DFSMN_H_

#include "csrc/enh/time_frequency.h"

namespace aps {

struct DfsmnOpts : public TimeFrequencyOpts {
  int32_t num_layers = 4;
  int32_t layer_lctx = 3;
  int32_t layer_rctx = 3;
};

class DfsmnNet : public TimeFrequencyNnet {
 public:
  explicit DfsmnNet(const DfsmnOpts& opts)
      : TimeFrequencyNnet(WithContext(opts)) {}

 private:
  static TimeFrequencyOpts WithContext(DfsmnOpts opts) {
    // total network context = per-layer context * layers
    opts.lctx = opts.num_layers * opts.layer_lctx;
    opts.rctx = opts.num_layers * opts.layer_rctx;
    return opts;
  }
};

}  // namespace aps

#endif  // APS_TPU_CSRC_ENH_DFSMN_H_
