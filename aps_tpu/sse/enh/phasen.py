#!/usr/bin/env python
"""PHASEN: two-stream (magnitude/phase) enhancement network.

Parity surface: /root/reference/aps/sse/enh/phasen.py (FTBlock:110,
TSBlock:164, Phasen:220 "sse@phasen"). Channel-last internal layout
N x F x T x C; convs use SAME padding like the reference's PhasenConv2d."""

from typing import Optional, Tuple

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.rnn import SingleRNN
from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import SSEBase


def _bn(x, training, name_scope, non_linear="relu"):
    out = nn.BatchNorm(use_running_average=not training, axis=-1,
                       momentum=0.9, name=name_scope)(x)
    if non_linear == "relu":
        return jax.nn.relu(out)
    if non_linear == "sigmoid":
        return jax.nn.sigmoid(out)
    return out


class GlobalNorm(nn.Module):
    """Normalize over (F, T, C) per sample with per-channel affine."""
    dim: int

    @nn.compact
    def __call__(self, inp):
        mean = jnp.mean(inp, (1, 2, 3), keepdims=True)
        var = jnp.mean((inp - mean)**2, (1, 2, 3), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        return gamma * (inp - mean) * jax.lax.rsqrt(var + 1e-5) + beta


class FTBlock(nn.Module):
    """Frequency transformation block over N x F x T x Ca."""
    channel_amp: int
    num_bins: int = 257
    channel_r: int = 5
    conv1d_kernel: int = 9

    @nn.compact
    def __call__(self, inp, training: bool = False):
        N, F, T, _ = inp.shape
        out = nn.Dense(self.channel_r, name="conv1x1_1")(inp)
        out = _bn(out, training, "bn1")
        # N x T x F*Cr
        out = jnp.swapaxes(out, 1, 2).reshape(N, T, -1)
        att = nn.Conv(self.channel_amp, (self.conv1d_kernel,),
                      padding="SAME", name="conv1d")(out)
        att = nn.BatchNorm(use_running_average=not training, axis=-1,
                           momentum=0.9, name="bn_att")(att)
        # N x 1 x T x Ca broadcast over F
        out = att[:, None] * inp
        # frequency linear map: N x F x T x Ca -> mix over F
        w = self.param("freq_linear", nn.initializers.lecun_normal(),
                       (self.num_bins, self.num_bins))
        out = jnp.einsum("gf,nftc->ngtc", w, out)
        cat = jnp.concatenate([out, inp], -1)
        out = nn.Dense(self.channel_amp, name="conv1x1_2")(cat)
        return _bn(out, training, "bn2")


class TSBlock(nn.Module):
    """Two-stream block: amplitude & phase streams with cross attention."""
    channel_amp: int
    channel_pha: int
    num_bins: int = 257
    channel_r: int = 5
    conv1d_kernel: int = 9

    @nn.compact
    def __call__(self, amp_and_pha: Tuple, training: bool = False):
        amp, pha = amp_and_pha
        amp = FTBlock(self.channel_amp, num_bins=self.num_bins,
                      channel_r=self.channel_r,
                      conv1d_kernel=self.conv1d_kernel,
                      name="ftb1")(amp, training=training)
        for i, k in enumerate([(5, 5), (1, 25), (5, 5)]):
            amp = nn.Conv(self.channel_amp, k, padding="SAME",
                          name=f"sa_conv_{i}")(amp)
            amp = _bn(amp, training, f"sa_bn_{i}")
        amp = FTBlock(self.channel_amp, num_bins=self.num_bins,
                      channel_r=self.channel_r,
                      conv1d_kernel=self.conv1d_kernel,
                      name="ftb2")(amp, training=training)
        for i, k in enumerate([(5, 3), (1, 25)]):
            pha = nn.Conv(self.channel_pha, k, padding="SAME",
                          name=f"sp_conv_{i}")(pha)
            pha = _bn(pha, training, f"sp_bn_{i}")
        att_a = nn.Dense(self.channel_amp, name="att_a")(pha)
        amp = jnp.tanh(att_a) * amp
        att_p = nn.Dense(self.channel_pha, name="att_p")(amp)
        pha = jnp.tanh(att_p) * pha
        return (amp, pha)


@ApsRegisters.sse.register("sse@phasen")
class Phasen(SSEBase):
    channel_amp: int = 24
    channel_pha: int = 12
    num_tsbs: int = 3
    num_bins: int = 257
    channel_r: int = 5
    conv1d_kernel: int = 9
    lstm_hidden: int = 256
    linear_size: int = 512
    training_mode: str = "freq"

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2])
        return self._forward(mix, self.training_mode, training)

    @nn.compact
    def _forward(self, mix, mode: str, training: bool):
        ctx = self.enh_transform.ctx("forward_stft")
        packed = ctx.forward(mix, return_polar=False)
        sr, si = packed[..., 0], packed[..., 1]
        # N x F x T x 2 channel-last
        inp = jnp.stack([sr, si], -1)
        amp = inp
        for i, k in enumerate([(7, 1), (1, 7)]):
            amp = nn.Conv(self.channel_amp, k, padding="SAME",
                          name=f"ca_conv_{i}")(amp)
            amp = _bn(amp, training, f"ca_bn_{i}")
        pha = GlobalNorm(2, name="gn0")(inp)
        pha = nn.Conv(self.channel_pha, (3, 5), padding="SAME",
                      name="cp_conv_0")(pha)
        pha = GlobalNorm(self.channel_pha, name="gn1")(pha)
        pha = nn.Conv(self.channel_pha, (25, 1), padding="SAME",
                      name="cp_conv_1")(pha)
        for i in range(self.num_tsbs):
            amp, pha = TSBlock(self.channel_amp, self.channel_pha,
                               num_bins=self.num_bins,
                               channel_r=self.channel_r,
                               conv1d_kernel=self.conv1d_kernel,
                               name=f"tsb_{i}")((amp, pha),
                                                training=training)
        amp = nn.Dense(8, name="conv1x1_a")(amp)
        pha = nn.Dense(2, name="conv1x1_p")(pha)
        # normalize phase: N x F x T x 2
        mag = jnp.sqrt(pha[..., 0]**2 + pha[..., 1]**2 + EPSILON)
        pha = pha / mag[..., None]
        # amp: N x F x T x 8 -> N x T x F*8
        N, F, T, _ = amp.shape
        amp = jnp.swapaxes(amp, 1, 2).reshape(N, T, -1)
        amp = SingleRNN(self.lstm_hidden, rnn_type="lstm",
                        bidirectional=True, name="blstm")(amp)
        out = amp
        for i, (size, nl) in enumerate([(self.linear_size, "relu"),
                                        (self.linear_size, "relu"),
                                        (self.num_bins, "sigmoid")]):
            out = nn.Dense(size, name=f"lin_{i}")(out)
            out = _bn(out, training, f"lin_bn_{i}", non_linear=nl)
        # mask: N x T x F -> N x F x T
        mask = jnp.swapaxes(out, 1, 2)
        sr = sr * mask
        si = si * mask
        pr, pi = pha[..., 0], pha[..., 1]
        pack_cplx = jnp.stack([sr * pr - si * pi, sr * pi + si * pr], -1)
        if mode == "freq":
            return pack_cplx
        return self.enh_transform.ctx("inverse_stft").inverse(
            pack_cplx, return_polar=False)

    def infer(self, mix: jnp.ndarray, mode="time"):
        self.check_args(mix, training=False, valid_dim=[1])
        enh = self._forward(mix[None, ...], mode, False)
        return enh[0]
