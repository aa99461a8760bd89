// Abstract real-time TF-masking enhancement driver.
// Parity surface: /root/reference/csrc/enh/time_frequency.{h,cc}
// (TimeFrequencyNnet: Process/Reset/Flush + complex masking).
#ifndef APS_TPU_CSRC_ENH_TIME_FREQUENCY_H_
#define APS_TPU_CSRC_ENH_TIME_FREQUENCY_H_

#include <memory>
#include <string>
#include <vector>

#include "csrc/base/nnet.h"
#include "csrc/base/pipeline.h"
#include "csrc/utils/stft.h"

namespace aps {

struct TimeFrequencyOpts {
  int32_t frame_len = 512;
  int32_t frame_hop = 256;
  std::string window = "sqrthann";
  std::string cpt_dir;          // checkpoint directory
  std::string function = "mask_predict";
  bool complex_mask = true;
  bool log_feature = true;      // log-magnitude input feature
  int32_t lctx = 0;             // network left context (frames)
  int32_t rctx = 0;             // network right context (frames)
};

class TimeFrequencyNnet {
 public:
  explicit TimeFrequencyNnet(const TimeFrequencyOpts& opts);
  virtual ~TimeFrequencyNnet() = default;

  // feed samples, collect enhanced samples (may lag by context frames)
  int32_t Process(const float* samples, int32_t num_samples,
                  std::vector<float>* enhanced);
  // flush remaining OLA tail
  void Flush(std::vector<float>* enhanced);
  void Reset();

 protected:
  // apply the (complex or real) mask to a cached spectrum frame and
  // synthesize frame_hop samples
  void ApplyMaskAndSynthesize(const float* mask, const float* spectrum,
                              std::vector<float>* enhanced);
  // convert one packed FFT frame into the network input feature
  void SpectrumToFeature(const float* stft, float* feature);

  TimeFrequencyOpts opts_;
  SpectrogramStage spectrogram_;
  StreamingiSTFT istft_;
  std::unique_ptr<PyNnet> nnet_;
  ContextQueue context_;
  std::deque<std::vector<float>> pending_spectra_;
  int32_t num_bins_, fft_size_;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_ENH_TIME_FREQUENCY_H_
