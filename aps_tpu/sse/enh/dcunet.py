#!/usr/bin/env python
"""DCUNet: real/complex UNet for speech enhancement.

Parity surface: /root/reference/aps/sse/enh/dcunet.py (ComplexConv2d:24,
ComplexConvTranspose2d:48, EncoderBlock:103, DecoderBlock:146, Encoder:188,
Decoder:226, DCUNet:277 "sse@dcunet", parse_1dstr/parse_2dstr:16-21).

TPU layout: N x (2)F x T x C channel-last; complex tensors ride as stacked
[real; imag] halves on the F axis exactly like the reference, so all complex
conv algebra is two real convs + add/sub. Torch conv-transpose padding
semantics are reproduced by slicing the VALID output."""

import warnings
from typing import List, Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase


def parse_1dstr(sstr: str) -> List[int]:
    return list(map(int, sstr.split(",")))


def parse_2dstr(sstr: str) -> List[List[int]]:
    return [parse_1dstr(tok) for tok in sstr.split(";")]


class _Conv2dTorch(nn.Module):
    """Conv with torch-style (freq, time) padding; causal pads time left."""
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    freq_pad: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        kf, kt = self.kernel_size
        tap = kt - 1 if self.causal else (kt - 1) // 2
        t_pad = (tap, 0) if self.causal else (tap, tap)
        return nn.Conv(self.out_channels, (kf, kt), strides=self.stride,
                       padding=[(self.freq_pad, self.freq_pad), t_pad])(x)


class _ConvTranspose2dTorch(nn.Module):
    """ConvTranspose matching torch output geometry (padding/out-padding)."""
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    freq_pad: int
    freq_out_pad: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        kf, kt = self.kernel_size
        sf, st = self.stride
        tap = kt - 1 if self.causal else (kt - 1) // 2
        t_pad = kt - 1 - tap
        y = nn.ConvTranspose(self.out_channels, (kf, kt),
                             strides=self.stride, padding="VALID",
                             transpose_kernel=True)(x)
        Fi, Ti = x.shape[1], x.shape[2]
        target_f = (Fi - 1) * sf - 2 * self.freq_pad + kf + self.freq_out_pad
        target_t = (Ti - 1) * st - 2 * t_pad + kt
        y = y[:, self.freq_pad:self.freq_pad + target_f,
              t_pad:t_pad + target_t]
        if self.causal:
            y = y[:, :, :-(kt - 1)] if kt > 1 else y
        return y


def _cplx_apply(module_fn, x):
    """Apply a linear module to [real; imag]-stacked input on the F axis."""
    xr, xi = jnp.split(x, 2, axis=1)
    real_mod = module_fn("real")
    imag_mod = module_fn("imag")
    yr = real_mod(xr) - imag_mod(xi)
    yi = imag_mod(xr) + real_mod(xi)
    return jnp.concatenate([yr, yi], axis=1)


class EncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    causal: bool = False
    cplx: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        """x: N x (2)F x T x C"""
        conv = lambda name: _Conv2dTorch(self.out_channels,
                                         tuple(self.kernel_size),
                                         tuple(self.stride),
                                         self.padding,
                                         causal=self.causal, name=name)
        if self.cplx:
            y = _cplx_apply(conv, x)
            yr, yi = jnp.split(y, 2, axis=1)
            bn = lambda name: nn.BatchNorm(use_running_average=not training,
                                           axis=-1, momentum=0.9, name=name)
            y = jnp.concatenate([bn("bn_r")(yr), bn("bn_i")(yi)], axis=1)
        else:
            y = conv("conv")(x)
            y = nn.BatchNorm(use_running_average=not training, axis=-1,
                             momentum=0.9, name="bn")(y)
        return jax.nn.leaky_relu(y, 0.01)


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    output_padding: int = 0
    causal: bool = False
    cplx: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        conv = lambda name: _ConvTranspose2dTorch(
            self.out_channels, tuple(self.kernel_size), tuple(self.stride),
            self.padding, self.output_padding, causal=self.causal, name=name)
        if self.cplx:
            y = _cplx_apply(conv, x)
        else:
            y = conv("conv")(x)
        if not self.last_layer:
            if self.cplx:
                yr, yi = jnp.split(y, 2, axis=1)
                bn = lambda name: nn.BatchNorm(
                    use_running_average=not training, axis=-1, momentum=0.9,
                    name=name)
                y = jnp.concatenate([bn("bn_r")(yr), bn("bn_i")(yi)], axis=1)
            else:
                y = nn.BatchNorm(use_running_average=not training, axis=-1,
                                 momentum=0.9, name="bn")(y)
            y = jax.nn.leaky_relu(y, 0.01)
        return y


class Encoder(nn.Module):
    cplx: bool
    K: tuple
    S: tuple
    C: tuple
    P: tuple
    causal: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        enc_h = []
        num_layers = len(self.K)
        for i, k in enumerate(self.K):
            x = EncoderBlock(self.C[i], self.C[i + 1], tuple(k),
                             stride=tuple(self.S[i]), padding=self.P[i],
                             cplx=self.cplx, causal=self.causal,
                             name=f"enc_{i}")(x, training=training)
            if i + 1 != num_layers:
                enc_h.append(x)
        return enc_h, x


class Decoder(nn.Module):
    cplx: bool
    K: tuple
    S: tuple
    C: tuple
    P: tuple
    O: tuple
    causal: bool = False
    connection: str = "sum"

    @nn.compact
    def __call__(self, x, enc_h: List, training: bool = False):
        if self.connection not in ["cat", "sum"]:
            raise ValueError(f"Unknown connection mode: {self.connection}")
        for i, k in enumerate(self.K):
            if i != 0:
                if self.connection == "sum":
                    x = x + enc_h[i - 1]
                else:
                    x = jnp.concatenate([x, enc_h[i - 1]], -1)
            x = DecoderBlock(self.C[i], self.C[i + 1], tuple(k),
                             stride=tuple(self.S[i]), padding=self.P[i],
                             output_padding=self.O[i], causal=self.causal,
                             cplx=self.cplx,
                             last_layer=(i == len(self.K) - 1),
                             name=f"dec_{i}")(x, training=training)
        return x


@ApsRegisters.sse.register("sse@dcunet")
class DCUNet(SSEBase):
    """Real/complex UNet over STFT."""
    cplx: bool = True
    K: str = "7,5;7,5;7,5;5,3;5,3;5,3;5,3"
    S: str = "2,1;2,1;2,1;2,1;2,1;2,1;2,1"
    C: str = "32,32,64,64,64,64,64"
    P: str = "1,1,1,1,1,1,1"
    O: str = "0,0,0,0,0,0,0"
    num_branch: int = 1
    non_linear: str = "tanh"
    causal_conv: bool = False
    connection: str = "sum"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        K = parse_2dstr(self.K)
        S = parse_2dstr(self.S)
        C = parse_1dstr(self.C)
        P = parse_1dstr(self.P)
        O = parse_1dstr(self.O)
        self.stft_ctx = self.enh_transform.ctx("forward_stft")
        self.enc = Encoder(self.cplx, tuple(map(tuple, K)),
                           tuple(map(tuple, S)), tuple([1] + C), tuple(P),
                           causal=self.causal_conv)
        self.dec = Decoder(self.cplx, tuple(map(tuple, K[::-1])),
                           tuple(map(tuple, S[::-1])),
                           tuple(C[::-1] + [self.num_branch]),
                           tuple(P[::-1]), tuple(O[::-1]),
                           causal=self.causal_conv,
                           connection=self.connection)
        if not self.cplx:
            self.mask_act = MaskNonLinear(self.non_linear, enable="common")
        else:
            if self.non_linear != "tanh":
                warnings.warn("cplx=True always uses tanh non-linearity")
            self.mask_act = None

    def _sep(self, m, sr, si):
        """m: N x (2)F x T; sr/si: N x F x T -> wave N x S"""
        if self.cplx:
            mr, mi = jnp.split(m, 2, axis=-2)
            m_abs = jnp.sqrt(mr**2 + mi**2 + EPSILON)
            m_mag = jnp.tanh(m_abs)
            mr, mi = m_mag * mr / m_abs, m_mag * mi / m_abs
            pack = jnp.stack([sr * mr - si * mi, sr * mi + si * mr], -1)
        else:
            m = self.mask_act(m)
            pack = jnp.stack([sr * m, si * m], -1)
        return self.stft_ctx.inverse(pack, return_polar=False)

    def _tf_mask(self, real, imag, training: bool, eps: float = EPSILON):
        """-> masks N x C x (2)F x T"""
        if self.cplx:
            inp = jnp.concatenate([real, imag], -2)
        else:
            inp = jnp.sqrt(real**2 + imag**2 + eps)
        # N x (2)F x T x 1 channel-last
        enc_h, h = self.enc(inp[..., None], training=training)
        enc_h = enc_h[::-1]
        masks = self.dec(h, enc_h, training=training)
        # N x (2)F x T x C -> N x C x (2)F x T
        return jnp.transpose(masks, (0, 3, 1, 2))

    def __call__(self, s: jnp.ndarray, training: bool = False):
        self.check_args(s, training=True, valid_dim=[2])
        packed = self.stft_ctx.forward(s, return_polar=False)
        sr, si = packed[..., 0], packed[..., 1]
        masks = self._tf_mask(sr, si, training)
        if self.num_branch == 1:
            return self._sep(masks[:, 0], sr, si)
        return [self._sep(masks[:, i], sr, si)
                for i in range(self.num_branch)]

    def infer(self, mix: jnp.ndarray, mode="time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self.__call__(mix[None, :], training=False)
        if self.num_branch == 1:
            return sep[0]
        return [s[0] for s in sep]
