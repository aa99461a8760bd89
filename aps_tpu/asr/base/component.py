#!/usr/bin/env python
"""Encoder building blocks: normalization wrappers, TDNN conv layers, FSMN,
variant RNN layers.

Parity surface: /root/reference/aps/asr/base/component.py (Normalize1d:86,
Normalize2d:115, Conv1d:192, Conv2d:251, FSMN:310, VariantRNN:389,
OneHotEmbedding:59).

TPU conventions: everything is channel-last (N x T x F, N x T x F x C) —
flax's native layout, which also keeps the feature axis on the 128-lane
dimension for the VPU/MXU. BatchNorm state lives in the "batch_stats"
collection carried by the trainer."""

from typing import Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.rnn import SingleRNN

rnn_output_nonlinear = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "none": None,
}


class OneHotEmbedding(nn.Module):
    vocab_size: int

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(x, self.vocab_size)


class Normalize1d(nn.Module):
    """BN / LN over N x T x F (feature axis normalized)."""
    name_: str
    inp_features: int = 0

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        name = self.name_.upper()
        if name == "BN":
            return nn.BatchNorm(use_running_average=not training,
                                axis=-1, momentum=0.9)(inp)
        if name == "LN":
            # reference uses GroupNorm(1, F) == LayerNorm over F per frame
            return nn.LayerNorm()(inp)
        raise ValueError(f"Unknown type of Normalize1d: {name}")


class Normalize2d(nn.Module):
    """BN / IN over N x T x F x C (channel-last)."""
    name_: str
    inp_features: int = 0

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        name = self.name_.upper()
        if name == "BN":
            return nn.BatchNorm(use_running_average=not training,
                                axis=-1, momentum=0.9)(inp)
        if name == "IN":
            # instance norm: normalize per (N, C) over T x F
            mean = jnp.mean(inp, axis=(1, 2), keepdims=True)
            var = jnp.var(inp, axis=(1, 2), keepdims=True)
            return (inp - mean) * jax.lax.rsqrt(var + 1e-5)
        raise ValueError(f"Unknown type of Normalize2d: {name}")


class Conv1d(nn.Module):
    """TDNN block: Conv1d -> Norm -> ReLU -> Dropout on N x T x F."""
    inp_features: int
    out_features: int
    kernel_size: int = 3
    stride: int = 2
    dilation: int = 1
    norm: str = "BN"
    dropout: float = 0
    for_streaming: bool = False

    @property
    def padding(self) -> int:
        return 0 if self.for_streaming else \
            (self.dilation * (self.kernel_size - 1)) // 2

    def compute_outp_dim(self, dim):
        return (dim + 2 * self.padding - self.dilation *
                (self.kernel_size - 1) - 1) // self.stride + 1

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        p = self.padding
        out = nn.Conv(self.out_features, (self.kernel_size,),
                      strides=(self.stride,),
                      kernel_dilation=(self.dilation,),
                      padding=[(p, p)])(inp)
        out = Normalize1d(name_=self.norm,
                          inp_features=self.out_features)(out,
                                                          training=training)
        out = jax.nn.relu(out)
        return nn.Dropout(self.dropout, deterministic=not training,
                          rng_collection="dropout")(out)


class Conv2d(nn.Module):
    """Conv2d block: Conv -> Norm -> ReLU on N x T x F x C (channel-last;
    the reference's NCHW N x C x T x F transposed)."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    dilation: Union[int, Tuple[int, int]] = 1
    norm: str = "BN"
    for_streaming: bool = False

    @staticmethod
    def _tup(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    @property
    def padding(self):
        k, d = self._tup(self.kernel_size), self._tup(self.dilation)
        pad = tuple((dd * (kk - 1)) // 2 for dd, kk in zip(d, k))
        if self.for_streaming:
            pad = (0, pad[-1])
        return pad

    def compute_outp_dim(self, dim, axis: int):
        k = self._tup(self.kernel_size)[axis]
        d = self._tup(self.dilation)[axis]
        s = self._tup(self.stride)[axis]
        return (dim + 2 * self.padding[axis] - d * k) // s + 1

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        """inp: N x T x F (auto-expand channel) or N x T x F x C."""
        if inp.ndim == 3:
            inp = inp[..., None]
        k = self._tup(self.kernel_size)
        s = self._tup(self.stride)
        d = self._tup(self.dilation)
        p = self.padding
        out = nn.Conv(self.out_channels, k, strides=s, kernel_dilation=d,
                      padding=[(p[0], p[0]), (p[1], p[1])])(inp)
        out = Normalize2d(name_=self.norm,
                          inp_features=self.out_channels)(out,
                                                          training=training)
        return jax.nn.relu(out)


class FSMN(nn.Module):
    """Feedforward sequential memory network layer.

    call(inp N x T x F, memory N x T x P) -> (out N x T x O, proj N x T x P)
    context aggregation is a depthwise conv over time."""
    inp_features: int
    out_features: int
    proj_features: int
    lctx: int = 3
    rctx: int = 3
    norm: str = "BN"
    dilation: int = 1
    dropout: float = 0.0
    for_streaming: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, memory=None, training: bool = False):
        if inp.ndim == 2:
            inp = inp[None]
        proj = nn.Dense(self.proj_features, use_bias=False,
                        name="inp_proj")(inp)
        # depthwise context conv over time
        dconv = nn.Conv(self.proj_features,
                        (self.lctx + self.rctx + 1,),
                        kernel_dilation=(max(self.dilation, 1),),
                        feature_group_count=self.proj_features,
                        use_bias=False,
                        padding=[(self.lctx, self.rctx)]
                        if not self.for_streaming else "VALID",
                        name="ctx_conv")
        if not self.for_streaming:
            ctx = dconv(proj)
        else:
            ctx = dconv(proj)
            if self.rctx > 0:
                proj = proj[:, self.lctx:-self.rctx]
                if memory is not None:
                    memory = memory[:, self.lctx:-self.rctx]
            else:
                proj = proj[:, self.lctx:]
                if memory is not None:
                    memory = memory[:, self.lctx:]
        proj = proj + ctx
        if memory is not None:
            proj = proj + memory
        out = nn.Dense(self.out_features, name="out_proj")(proj)
        if self.norm != "none":
            out = Normalize1d(name_=self.norm,
                              inp_features=self.out_features)(
                                  out, training=training)
            out = jax.nn.relu(out)
            out = nn.Dropout(self.dropout, deterministic=not training,
                             rng_collection="dropout")(out)
        return out, proj


class VariantRNN(nn.Module):
    """RNN -> (Linear) -> (Norm) -> (NonLinear) -> (Dropout)."""
    input_size: int
    rnn: str = "lstm"
    norm: str = ""
    hidden: int = 512
    project: int = -1
    non_linear: str = "relu"
    dropout: float = 0.0
    bidirectional: bool = False
    add_forward_backward: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, inp_len=None,
                 training: bool = False):
        if self.non_linear not in rnn_output_nonlinear:
            raise ValueError(f"Unsupported non_linear: {self.non_linear}")
        out = SingleRNN(self.hidden, rnn_type=self.rnn,
                        bidirectional=self.bidirectional)(
                            inp, inp_len=inp_len, training=training)
        if self.bidirectional and self.add_forward_backward:
            fwd, bwd = jnp.split(out, 2, axis=-1)
            out = fwd + bwd
        if self.project > 0:
            out = nn.Dense(self.project)(out)
        if self.norm:
            out = Normalize1d(name_=self.norm, inp_features=0)(
                out, training=training)
        fn = rnn_output_nonlinear[self.non_linear]
        if fn is not None:
            out = fn(out)
        if self.dropout != 0:
            out = nn.Dropout(self.dropout, deterministic=not training,
                             rng_collection="dropout")(out)
        return out
