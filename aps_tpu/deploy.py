#!/usr/bin/env python
"""Deployment-side model runner, driven by the C++ runtime (csrc/base/nnet.cc)
through an embedded interpreter. Replaces the reference's TorchScript
consumption path (cmd/export_for_libtorch.py artifacts)."""

import os
from typing import Tuple

# the runtime runs on CPU edge devices; force the CPU backend even when a
# site hook (e.g. an accelerator plugin's sitecustomize) preset JAX_PLATFORMS
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # already initialized elsewhere
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


class RtModel(object):
    """Load a checkpoint and expose a jitted per-chunk function with a
    bytes-in/bytes-out ABI (no numpy C-API needed on the C++ side)."""

    def __init__(self, cpt_dir: str, function: str = "mask_predict",
                 cpt_tag: str = "best"):
        from aps_tpu.eval import NnetEvaluator
        self.evaluator = NnetEvaluator(cpt_dir, cpt_tag=cpt_tag)
        self.function = function
        # variables ride as a jit ARGUMENT: closed-over arrays become
        # program constants, which bloats the HLO and keys the persistent
        # compilation cache on the weight values (no cross-process reuse)
        self._jit = jax.jit(
            lambda v, feats: self.evaluator.nnet.apply(
                v, feats, method=function))

    def forward_bytes(self, data: bytes, num_frames: int,
                      dim: int) -> Tuple[bytes, tuple]:
        feats = np.frombuffer(data, dtype=np.float32).reshape(
            1, num_frames, dim)
        out = self._jit(self.evaluator.variables, jnp.asarray(feats))
        out = np.asarray(out, dtype=np.float32)
        return out.tobytes(), tuple(out.shape)


class RtStablehlo(object):
    """Run a cmd/export.py StableHLO artifact (model.stablehlo)."""

    def __init__(self, export_dir: str):
        from jax import export as jexport
        with open(os.path.join(export_dir, "model.stablehlo"), "rb") as fd:
            self.exported = jexport.deserialize(bytearray(fd.read()))

    def forward_bytes(self, data: bytes, num_frames: int,
                      dim: int) -> Tuple[bytes, tuple]:
        feats = np.frombuffer(data, dtype=np.float32).reshape(
            1, num_frames, dim)
        out = self.exported.call(jnp.asarray(feats))
        out = np.asarray(out, dtype=np.float32)
        return out.tobytes(), tuple(out.shape)


class RtSeparator(object):
    """Offline wave-in/wave-out enhancement/separation runner for the C++
    deployment runtime (examples/sse/export_dcunet — the reference's
    examples/sse/torchscript_dcunet consumed a traced DCUNet the same way).
    Calls the model's `infer` contract (aps_tpu/sse/base.py)."""

    def __init__(self, cpt_dir: str, cpt_tag: str = "best"):
        from aps_tpu.eval import NnetEvaluator
        self.evaluator = NnetEvaluator(cpt_dir, cpt_tag=cpt_tag)
        self._jit = jax.jit(
            lambda v, mix: self.evaluator.nnet.apply(
                v, mix, method="infer"))

    def enhance_bytes(self, data: bytes,
                      num_samples: int) -> Tuple[bytes, tuple]:
        mix = np.frombuffer(data, dtype=np.float32)[:num_samples]
        out = self._jit(self.evaluator.variables, jnp.asarray(mix))
        if isinstance(out, (list, tuple)):  # multi-branch: stack sources
            out = jnp.stack(list(out))
        out = np.asarray(out, dtype=np.float32)
        return out.tobytes(), tuple(out.shape)
