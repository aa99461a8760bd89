// Neural-network executor for the deployment runtime.
// The reference (csrc/base/pipeline.h Feature stage) executes TorchScript;
// our models are JAX — the runtime embeds a CPython interpreter and drives
// the exported/checkpointed model through aps_tpu.deploy.RtModel (CPU jax).
// This keeps the hot DSP path (framing/FFT/OLA) native while the network
// runs through the same compiled XLA path used in python.
#ifndef APS_TPU_CSRC_BASE_NNET_H_
#define APS_TPU_CSRC_BASE_NNET_H_

#include <cstdint>
#include <string>
#include <vector>

namespace aps {

class PyNnet {
 public:
  // cpt_dir: checkpoint directory (train.yaml + best.ckpt)
  // function: model method to call per chunk (e.g. "mask_predict")
  PyNnet(const std::string& cpt_dir, const std::string& function,
         const std::string& cpt_tag = "best");
  ~PyNnet();

  // run the model on a T x F float block; returns the flattened output
  // and its shape in out_shape
  bool Forward(const float* feats, int32_t num_frames, int32_t dim,
               std::vector<float>* out, std::vector<int64_t>* out_shape);

 private:
  void* model_ = nullptr;  // PyObject* (opaque to avoid Python.h in header)
};

// Offline wave-in/wave-out enhancement/separation executor backed by
// aps_tpu.deploy.RtSeparator (the model's `infer` contract). Used by the
// examples/sse/export_dcunet demo — the analog of the reference's
// examples/sse/torchscript_dcunet/dcunet-enhan.cc consuming a traced net.
class PySeparator {
 public:
  PySeparator(const std::string& cpt_dir, const std::string& cpt_tag = "best");
  ~PySeparator();

  // run the model on the whole utterance; out_shape is (S,) for single
  // source models or (num_spks, S) for separators
  bool Enhance(const float* samples, int32_t num_samples,
               std::vector<float>* out, std::vector<int64_t>* out_shape);

 private:
  void* model_ = nullptr;
};

}  // namespace aps

#endif  // APS_TPU_CSRC_BASE_NNET_H_
