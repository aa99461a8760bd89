// Streaming transformer enhancement driver (parity:
// /root/reference/csrc/enh/transformer.{h,cc}), matching
// aps_tpu/rt_sse/enh/transformer.py (chunked attention with lctx chunks).
#ifndef APS_TPU_CSRC_ENH_TRANSFORMER_H_
#define APS_TPU_CSRC_ENH_TRANSFORMER_H_

#include "csrc/enh/time_frequency.h"

namespace aps {

struct TransformerOpts : public TimeFrequencyOpts {
  int32_t chunk = 1;
  int32_t att_lctx = 3;
};

class TransformerNet : public TimeFrequencyNnet {
 public:
  explicit TransformerNet(const TransformerOpts& opts)
      : TimeFrequencyNnet(WithContext(opts)) {}

 private:
  static TimeFrequencyOpts WithContext(TransformerOpts opts) {
    opts.lctx = opts.att_lctx * opts.chunk;
    opts.rctx = 0;  // causal attention: no right context
    return opts;
  }
};

}  // namespace aps

#endif  // APS_TPU_CSRC_ENH_TRANSFORMER_H_
