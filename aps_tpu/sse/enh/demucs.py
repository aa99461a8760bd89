#!/usr/bin/env python
"""DEMUCS waveform U-net enhancer.

Parity surface: /root/reference/aps/sse/enh/demucs.py (Upsampling:72,
DnSampling:88, Encoder:107, Decoder:129, DEMUCS:157 "sse@demucs",
workout_train_chunk_length:35)."""

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.asr.base.rnn import StackedRNN
from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import SSEBase


def kernel_sampling(zeros: int = 56) -> np.ndarray:
    win = np.hanning(4 * zeros + 1)  # symmetric window
    winodd = win[1::2]
    t = np.linspace(-zeros + 0.5, zeros - 0.5, 2 * zeros)
    return (np.sinc(t) * winodd).astype(np.float32)


def workout_train_chunk_length(inp_len: int,
                               resampling_factor: int = 1,
                               num_encoders: int = 5,
                               kernel: int = 8,
                               stride: int = 2) -> int:
    out_len = inp_len * resampling_factor
    for _ in range(num_encoders):
        out_len = math.ceil((out_len - kernel) / stride) + 1
    for _ in range(num_encoders):
        out_len = (out_len - 1) * stride + kernel
    return math.ceil(out_len / resampling_factor)


def _conv1d_kernel(x: jnp.ndarray, kernel: np.ndarray, pad: int,
                   trim: str) -> jnp.ndarray:
    """Correlate last axis with a fixed kernel (sinc interpolation)."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1], 1)
    k = jnp.asarray(kernel)[:, None, None]
    out = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"))[..., 0]
    if trim == "head":
        out = out[..., 1:]
    elif trim == "tail":
        out = out[..., :-1]
    return out.reshape(*shape[:-1], out.shape[-1])


def upsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """2x sinc upsampling of the last axis."""
    out = _conv1d_kernel(x, kernel_sampling(zeros), zeros, "head")
    y = jnp.stack([x, out], axis=-1)
    return y.reshape(*x.shape[:-1], -1)


def downsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """2x sinc downsampling of the last axis."""
    if x.shape[-1] % 2:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    xeven = x[..., ::2]
    xodd = x[..., 1::2]
    out = _conv1d_kernel(xodd, kernel_sampling(zeros), zeros, "tail")
    return (xeven + out) * 0.5


@ApsRegisters.sse.register("sse@demucs")
class DEMUCS(SSEBase):
    """Real-time waveform-domain enhancement (Defossez et al. 2020)."""
    channel: int = 64
    stride: int = 2
    kernel: int = 8
    resampling_factor: int = 1
    num_layers: int = 5
    rnn_layers: int = 2
    growth: float = 2
    bidirectional: bool = False
    rescale: float = 0.1
    training_mode: str = "time"

    @nn.compact
    def __call__(self, mix: jnp.ndarray, training: bool = False):
        """mix: N x S -> enh N x S'"""
        self.check_args(mix, training=True, valid_dim=[2])
        assert self.resampling_factor in [1, 2, 4]
        std = jnp.std(mix, axis=-1, keepdims=True)
        mix = mix / (std + EPSILON)
        out = mix[..., None]  # N x S x 1
        if self.resampling_factor != 1:
            steps = int(math.log2(self.resampling_factor))
            sig = out[..., 0]
            for _ in range(steps):
                sig = upsample2(sig)
            out = sig[..., None]
        H = self.channel
        enc_out = []
        for i in range(self.num_layers):
            ch = int(H * self.growth**i)
            out = nn.Conv(ch, (self.kernel,), strides=(self.stride,),
                          padding="VALID", name=f"enc_conv_{i}")(out)
            out = jax.nn.relu(out)
            out = nn.Dense(ch, name=f"enc_pw_{i}")(out)
            out = jax.nn.relu(out)
            enc_out.append(out)
        # bottleneck LSTM: N x T x C
        Hb = int(H * self.growth**(self.num_layers - 1))
        out = StackedRNN(Hb, num_layers=self.rnn_layers, rnn_type="lstm",
                         bidirectional=self.bidirectional,
                         name="lstm")(out, training=training)
        if self.bidirectional:
            out = nn.Dense(Hb, name="proj")(out)
        enc_out = enc_out[::-1]
        for i in range(self.num_layers):
            ch_in = int(H * self.growth**(self.num_layers - 1 - i))
            ch_out = 1 if i == self.num_layers - 1 else int(
                H * self.growth**(self.num_layers - 2 - i))
            skip = enc_out[i][:, :out.shape[1]]
            out = skip + out
            out = nn.Dense(ch_in, name=f"dec_pw_{i}")(out)
            out = jax.nn.relu(out)
            out = nn.ConvTranspose(ch_out, (self.kernel,),
                                   strides=(self.stride,),
                                   padding="VALID",
                                   name=f"dec_conv_{i}")(out)
            if i != self.num_layers - 1:
                out = jax.nn.relu(out)
        enh = out[..., 0]
        if self.resampling_factor != 1:
            steps = int(math.log2(self.resampling_factor))
            for _ in range(steps):
                enh = downsample2(enh)
        return enh * std

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        inp_len = mix.shape[-1]
        pad = workout_train_chunk_length(
            inp_len, resampling_factor=self.resampling_factor,
            num_encoders=self.num_layers, kernel=self.kernel,
            stride=self.stride) - inp_len
        inp = jnp.pad(mix, (0, pad)) if pad else mix
        enh = self.__call__(inp[None, ...], training=False)
        return enh[0, :inp_len]
