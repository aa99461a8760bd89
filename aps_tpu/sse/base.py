#!/usr/bin/env python
"""SSE model base contract.

Parity surface: /root/reference/aps/sse/base.py (SSEBase:68, tf_masking:23,
MaskNonLinear:112). Complex math is real-pair over packed `... x 2`
spectra (aps_tpu/ops/cplx_pair) — the bench TPU runtime implements no
complex64, and the reference's ComplexTensor workaround (aps/cplx.py)
is equally unnecessary."""

from typing import List, Optional, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

all_ = ["none", "relu", "tanh", "softplus", "sigmoid", "softmax"]
all_wo_softmax = ["none", "relu", "tanh", "softplus", "sigmoid"]
positive = ["relu", "softplus", "sigmoid", "softmax"]
positive_wo_softmax = ["relu", "softplus", "sigmoid"]
positive_wo_softplus = ["relu", "sigmoid", "softmax"]
common = ["relu", "sigmoid"]
bounded = ["sigmoid", "softmax"]
unbounded = ["none", "relu", "tanh", "softplus"]

supported_nonlinear = {
    "none": lambda x: x,            # [-oo, +oo]
    "relu": jax.nn.relu,            # [0, +oo]
    "tanh": jnp.tanh,               # [-1, 1]
    "softplus": jax.nn.softplus,    # [0, +oo]
    "sigmoid": jax.nn.sigmoid,      # [0, 1]
    "softmax": lambda x: jax.nn.softmax(x, axis=0),  # over speaker axis
}


def tf_masking(mix_stft: jnp.ndarray,
               src_mask: jnp.ndarray,
               channel: int = 0) -> jnp.ndarray:
    """Apply a real or complex TF mask.
    mix_stft: N x (C) x F x T x 2; src_mask: N x F x T (real) or
    N x F x T x 2 (complex) -> N x F x T x 2."""
    assert mix_stft.ndim in (4, 5)
    assert src_mask.ndim in (3, 4)
    if mix_stft.ndim == 5:
        mix_stft = mix_stft[:, channel]
    # real-pair complex multiply: some TPU runtimes lack complex64 support
    mr, mi = mix_stft[..., 0], mix_stft[..., 1]
    if src_mask.ndim == 4:
        assert src_mask.shape[-1] == 2
        kr, ki = src_mask[..., 0], src_mask[..., 1]
        return jnp.stack([mr * kr - mi * ki, mr * ki + mi * kr], -1)
    return jnp.stack([mr * src_mask, mi * src_mask], -1)


class SSEBase(nn.Module):
    """Base class for separation/enhancement models.

    Subclasses define `enh_transform` (an EnhTransform module or None) and
    `training_mode` in {"freq", "time"}; training uses __call__, inference
    implements infer()."""
    enh_transform: Optional[nn.Module] = None
    training_mode: str = "freq"

    def check_args(self, mix, training=True, valid_dim=[2]):
        if mix.ndim not in valid_dim:
            supported = "/".join(str(d) for d in valid_dim)
            raise RuntimeError(
                f"Expects {supported}D tensor "
                f"({'training' if training else 'inference'}), "
                f"got {mix.ndim} instead")

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        raise NotImplementedError


class MaskNonLinear(nn.Module):
    """Mask activation with optional scaling/clipping."""
    non_linear: str
    enable: str = "all"
    scale: float = 1
    vmax: Optional[float] = None
    vmin: Optional[float] = None

    def setup(self):
        supported_set = {
            "positive": positive,
            "positive_wo_softmax": positive_wo_softmax,
            "positive_wo_softplus": positive_wo_softplus,
            "all": all_,
            "all_wo_softmax": all_wo_softmax,
            "bounded": bounded,
            "unbounded": unbounded,
            "common": common
        }
        if self.non_linear not in supported_set[self.enable]:
            raise ValueError(f"Unsupported nonlinear: {self.non_linear}")
        self.fn = supported_nonlinear[self.non_linear]

    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        if inp.ndim not in (3, 4):
            raise RuntimeError(
                f"MaskNonLinear expects 3/4D tensor, got {inp.ndim}")
        out = self.fn(inp) * self.scale
        if self.vmax is not None:
            out = jnp.minimum(out, self.vmax)
        if self.vmin is not None:
            out = jnp.maximum(out, self.vmin)
        return out
