#include "csrc/enh/time_frequency.h"

#include <cmath>

#include "csrc/utils/log.h"
#include "csrc/utils/math.h"

namespace aps {

TimeFrequencyNnet::TimeFrequencyNnet(const TimeFrequencyOpts& opts)
    : opts_(opts),
      spectrogram_(opts.frame_len, opts.frame_hop, opts.window),
      istft_(opts.frame_len, opts.frame_hop, opts.window),
      context_(spectrogram_.num_bins(), opts.lctx, opts.rctx) {
  num_bins_ = spectrogram_.num_bins();
  fft_size_ = spectrogram_.fft_size();
  nnet_ = std::make_unique<PyNnet>(opts.cpt_dir, opts.function);
}

void TimeFrequencyNnet::SpectrumToFeature(const float* stft,
                                          float* feature) {
  // packed layout: [X0.re, XN/2.re, X1.re, X1.im, ...]
  feature[0] = std::fabs(stft[0]);
  feature[num_bins_ - 1] = std::fabs(stft[1]);
  for (int32_t k = 1; k < fft_size_ / 2; ++k) {
    float re = stft[2 * k], im = stft[2 * k + 1];
    feature[k] = std::sqrt(re * re + im * im);
  }
  if (opts_.log_feature) {
    for (int32_t k = 0; k < num_bins_; ++k)
      feature[k] = std::log(std::max(feature[k], kEpsilon));
  }
}

void TimeFrequencyNnet::ApplyMaskAndSynthesize(
    const float* mask, const float* spectrum,
    std::vector<float>* enhanced) {
  std::vector<float> masked(fft_size_);
  if (opts_.complex_mask) {
    // mask: F x 2 (real/imag)
    float m0r = mask[0], mNr = mask[(num_bins_ - 1) * 2];
    masked[0] = spectrum[0] * m0r;
    masked[1] = spectrum[1] * mNr;
    for (int32_t k = 1; k < fft_size_ / 2; ++k) {
      float sr = spectrum[2 * k], si = spectrum[2 * k + 1];
      float mr = mask[2 * k], mi = mask[2 * k + 1];
      masked[2 * k] = sr * mr - si * mi;
      masked[2 * k + 1] = sr * mi + si * mr;
    }
  } else {
    masked[0] = spectrum[0] * mask[0];
    masked[1] = spectrum[1] * mask[num_bins_ - 1];
    for (int32_t k = 1; k < fft_size_ / 2; ++k) {
      masked[2 * k] = spectrum[2 * k] * mask[k];
      masked[2 * k + 1] = spectrum[2 * k + 1] * mask[k];
    }
  }
  size_t base = enhanced->size();
  enhanced->resize(base + opts_.frame_hop);
  istft_.Compute(masked.data(), fft_size_, enhanced->data() + base);
}

int32_t TimeFrequencyNnet::Process(const float* samples,
                                   int32_t num_samples,
                                   std::vector<float>* enhanced) {
  spectrogram_.Process(samples, num_samples);
  std::vector<float> stft(fft_size_), feature(num_bins_);
  while (spectrogram_.Pop(stft.data())) {
    SpectrumToFeature(stft.data(), feature.data());
    context_.Process(feature.data());
    pending_spectra_.emplace_back(stft);
    std::vector<float> block;
    if (context_.Pop(&block)) {
      std::vector<float> out;
      std::vector<int64_t> shape;
      int32_t window = opts_.lctx + 1 + opts_.rctx;
      if (!nnet_->Forward(block.data(), window, num_bins_, &out, &shape))
        LOG_FAIL << "nnet forward failed";
      // expect mask for the center frame: take middle of the output
      // out shape: [.., T, F] or [.., T, F, 2]
      int32_t T = 1;
      int32_t stride = num_bins_ * (opts_.complex_mask ? 2 : 1);
      if (static_cast<int64_t>(out.size()) >= stride) {
        // center frame index within the returned block
        int64_t frames = static_cast<int64_t>(out.size()) / stride;
        int64_t center = frames > opts_.lctx ? opts_.lctx : frames - 1;
        const float* mask = out.data() + center * stride;
        ApplyMaskAndSynthesize(mask, pending_spectra_.front().data(),
                               enhanced);
        pending_spectra_.pop_front();
        (void)T;
      }
    }
  }
  return static_cast<int32_t>(enhanced->size());
}

void TimeFrequencyNnet::Flush(std::vector<float>* enhanced) {
  int32_t overlap = istft_.win_length() - opts_.frame_hop;
  size_t base = enhanced->size();
  enhanced->resize(base + overlap);
  istft_.Flush(enhanced->data() + base);
}

void TimeFrequencyNnet::Reset() {
  spectrogram_.Reset();
  istft_.Reset();
  context_.Reset();
  pending_spectra_.clear();
}

}  // namespace aps
