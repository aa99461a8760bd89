#!/usr/bin/env python
"""DenseUnet separation/enhancement network.

Parity surface: /root/reference/aps/sse/bss/dense_unet.py (EncoderBlock:19,
DecoderBlock:57, DenseBlock:97, Encoder:208, Decoder:259, DenseUnet:321
"sse@dense_unet"). Channel-last N x F x T x C."""

from typing import List, Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase
from aps_tpu.sse.bss.dccrn import LSTMWrapper
from aps_tpu.sse.enh.dcunet import parse_1dstr, parse_2dstr


def _norm(x, norm, training, name):
    if norm == "IN":
        mean = jnp.mean(x, (1, 2), keepdims=True)
        var = jnp.var(x, (1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return nn.BatchNorm(use_running_average=not training, axis=-1,
                        momentum=0.9, name=name)(x)


class EncoderBlock(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    dropout: float = 0
    norm: str = "IN"
    first_layer: bool = False

    @nn.compact
    def __call__(self, inp, training: bool = False):
        pf, pt = self.padding
        out = nn.Conv(self.out_channels, tuple(self.kernel_size),
                      strides=tuple(self.stride),
                      padding=[(pf, pf), (pt, pt)])(inp)
        if self.first_layer:
            return out
        out = jax.nn.elu(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training,
                             rng_collection="dropout")(out)
        return _norm(out, self.norm, training, "norm")


class DecoderBlock(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    dropout: float = 0
    norm: str = "IN"
    last_layer: bool = False

    @nn.compact
    def __call__(self, inp, training: bool = False):
        kf, kt = self.kernel_size
        sf, st = self.stride
        pf, pt = self.padding
        of, ot = self.output_padding
        y = nn.ConvTranspose(self.out_channels, (kf, kt),
                             strides=(sf, st), padding="VALID",
                             transpose_kernel=True)(inp)
        Fi, Ti = inp.shape[1], inp.shape[2]
        tf_ = (Fi - 1) * sf - 2 * pf + kf + of
        tt = (Ti - 1) * st - 2 * pt + kt + ot
        out = y[:, pf:pf + tf_, pt:pt + tt]
        if self.last_layer:
            return out
        out = jax.nn.elu(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training,
                             rng_collection="dropout")(out)
        return _norm(out, self.norm, training, "norm")


class DenseBlock(nn.Module):
    out_channels: int
    growth_rate: int
    kernel_size: Tuple[int, int] = (3, 3)
    num_layers: int = 5
    norm: str = "IN"

    @nn.compact
    def __call__(self, inp, training: bool = False):
        inputs = [inp]
        for i in range(self.num_layers):
            out_ch = self.growth_rate if i != self.num_layers - 1 else \
                self.out_channels
            inp = EncoderBlock(out_ch,
                               kernel_size=tuple(self.kernel_size),
                               stride=(1, 1),
                               norm=self.norm,
                               padding=(1, 1),
                               name=f"conv_{i}")(
                                   jnp.concatenate(inputs, -1),
                                   training=training)
            inputs.append(inp)
        return inp


class EncoderDenseBlock(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    dropout: float = 0
    padding: Tuple[int, int] = (1, 1)
    norm: str = "IN"
    inner_dense_layer: int = 5
    first_layer: bool = False

    @nn.compact
    def __call__(self, inp, training: bool = False):
        sub1 = EncoderBlock(self.out_channels,
                            kernel_size=tuple(self.kernel_size),
                            stride=tuple(self.stride),
                            padding=tuple(self.padding),
                            dropout=self.dropout,
                            norm=self.norm,
                            first_layer=self.first_layer,
                            name="sub1")(inp, training=training)
        return DenseBlock(self.out_channels, self.out_channels,
                          num_layers=self.inner_dense_layer,
                          norm=self.norm, name="sub2")(sub1,
                                                       training=training)


class DecoderDenseBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    dropout: float = 0
    norm: str = "IN"
    inner_dense_layer: int = 5
    last_layer: bool = False
    last_out_channels: int = 2

    @nn.compact
    def __call__(self, inp, training: bool = False):
        sub1 = DenseBlock(self.in_channels * 2, self.in_channels,
                          num_layers=self.inner_dense_layer,
                          norm=self.norm, name="sub1")(inp,
                                                       training=training)
        return DecoderBlock(
            self.last_out_channels if self.last_layer else self.out_channels,
            kernel_size=tuple(self.kernel_size),
            stride=tuple(self.stride),
            padding=tuple(self.padding),
            dropout=self.dropout,
            output_padding=tuple(self.output_padding),
            norm=self.norm,
            last_layer=self.last_layer,
            name="sub2")(sub1, training=training)


@ApsRegisters.sse.register("sse@dense_unet")
class DenseUnet(SSEBase):
    """Boosted (dense) UNet separation model."""
    inp_cplx: bool = False
    out_cplx: bool = False
    K: str = "3,3;3,3;3,3;3,3;3,3;3,3;3,3;3,3"
    S: str = "1,1;2,1;2,1;2,1;2,1;2,1;2,1;2,1"
    P: str = "0,1;0,1;0,1;0,1;0,1;0,1;0,1;0,1;0,1"
    O: str = "0,0,0,0,0,0,0,0"
    enc_channel: str = "16,32,32,32,32,64,128,384"
    dec_channel: str = "32,16,32,32,32,32,64,128"
    conv_dropout: float = 0
    norm: str = "IN"
    num_spks: int = 2
    rnn_hidden: int = 512
    rnn_layers: int = 2
    rnn_resize: int = 512
    rnn_bidir: bool = False
    rnn_dropout: float = 0
    num_dense_blocks: int = 4
    non_linear: str = "sigmoid"
    non_linear_scale: float = 1
    non_linear_vmax: Optional[float] = None
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        if self.non_linear:
            self.mask_act = MaskNonLinear(self.non_linear,
                                          enable="all_wo_softmax",
                                          scale=self.non_linear_scale,
                                          vmax=self.non_linear_vmax)
        else:
            self.mask_act = None
        self.rnn = LSTMWrapper(self.rnn_resize,
                               hidden_size=self.rnn_hidden,
                               cplx=False,
                               dropout=self.rnn_dropout,
                               num_layers=self.rnn_layers,
                               bidirectional=self.rnn_bidir)

    def _encode_decode(self, s, training: bool):
        K = parse_2dstr(self.K)
        S = parse_2dstr(self.S)
        P = parse_2dstr(self.P)
        O = parse_1dstr(self.O)
        enc_c = parse_1dstr(self.enc_channel)
        dec_c = parse_1dstr(self.dec_channel)
        total = len(enc_c)
        enc_h = []
        x = s
        for i in range(total):
            if i < self.num_dense_blocks:
                x = EncoderDenseBlock(enc_c[i], kernel_size=K[i],
                                      padding=P[i], stride=S[i],
                                      dropout=self.conv_dropout,
                                      norm=self.norm,
                                      first_layer=(i == 0),
                                      name=f"enc_{i}")(x, training=training)
            else:
                x = EncoderBlock(enc_c[i], kernel_size=K[i], stride=S[i],
                                 padding=P[i], dropout=self.conv_dropout,
                                 norm=self.norm, first_layer=(i == 0),
                                 name=f"enc_{i}")(x, training=training)
            enc_h.append(x)
        enc_h, h = enc_h[:-1], enc_h[-1]
        # rnn over N x C x F x T layout
        h_cf = jnp.transpose(h, (0, 3, 1, 2))
        out_h = self.rnn(h_cf, training=training)
        h = jnp.concatenate(
            [jnp.transpose(out_h, (0, 2, 3, 1)), h], -1)
        enc_h = enc_h[::-1]
        # decoder (reversed config)
        Kd, Sd, Pd, Od = K[::-1], S[::-1], P[::-1], O[::-1]
        dec_out = dec_c[::-1] + [self.num_spks * (2 if self.out_cplx else 1)]
        enc_rev = enc_c[::-1]
        x = h
        for i in range(total):
            last = i == total - 1
            if i < total - self.num_dense_blocks:
                if i != 0:
                    x = jnp.concatenate([x, enc_h[i - 1]], -1)
                x = DecoderBlock(dec_out[i], kernel_size=Kd[i],
                                 stride=Sd[i], padding=Pd[i],
                                 output_padding=(Od[i], 0),
                                 dropout=self.conv_dropout, norm=self.norm,
                                 last_layer=last,
                                 name=f"dec_{i}")(x, training=training)
            else:
                if i != 0:
                    x = jnp.concatenate([x, enc_h[i - 1]], -1)
                x = DecoderDenseBlock(enc_rev[i], dec_out[i],
                                      kernel_size=Kd[i], stride=Sd[i],
                                      padding=Pd[i],
                                      output_padding=(Od[i], 0),
                                      dropout=self.conv_dropout,
                                      norm=self.norm,
                                      last_out_channels=dec_out[-1],
                                      last_layer=last,
                                      name=f"dec_{i}")(x, training=training)
        # N x F x T x C -> N x C x F x T
        return jnp.transpose(x, (0, 3, 1, 2))

    def sep(self, m, sr, si, mode: str = "freq"):
        """m: N x (2|1) x F x T"""
        if self.out_cplx:
            mr, mi = m[:, 0], m[:, 1]
            if self.mask_act is not None:
                m_abs = jnp.sqrt(mr**2 + mi**2)
                m_mag = self.mask_act(m_abs)
                if mode == "freq":
                    s = m_mag
                else:
                    mr, mi = m_mag * mr / m_abs, m_mag * mi / m_abs
                    s = jnp.stack([sr * mr - si * mi, sr * mi + si * mr], -1)
                    s = self.enh_transform.decode([s])[0]
            else:
                s = jnp.stack([mr, mi], -1)
                if mode != "freq":
                    s = self.enh_transform.decode([s])[0]
        else:
            if self.mask_act is not None:
                mm = self.mask_act(m[:, 0])
                if mode == "freq":
                    s = mm
                else:
                    s = jnp.stack([sr * mm, si * mm], -1)
                    s = self.enh_transform.decode([s])[0]
            else:
                mm = m[:, 0]
                if mode == "freq":
                    s = mm
                else:
                    s_abs = jnp.sqrt(sr**2 + si**2)
                    s = jnp.stack([mm * sr / s_abs, mm * si / s_abs], -1)
                    s = self.enh_transform.decode([s])[0]
        return s

    @nn.compact
    def _forward(self, mix, mode: str, training: bool):
        packed, _ = self.enh_transform.encode(mix, None)
        sr, si = packed[..., 0], packed[..., 1]
        if self.inp_cplx:
            mag = jnp.sqrt(sr**2 + si**2)
            # N x F x T x 3
            s = jnp.stack([sr, si, mag], -1)
        else:
            feats = self.enh_transform(packed, training=training)
            # N x T x F -> N x F x T x 1
            s = jnp.swapaxes(feats, 1, 2)[..., None]
        spk_m = self._encode_decode(s, training)
        if self.num_spks == 1:
            return self.sep(spk_m, sr, si, mode=mode)
        chunk_m = jnp.split(spk_m, self.num_spks, 1)
        return [self.sep(m, sr, si, mode=mode) for m in chunk_m]

    def __call__(self, s: jnp.ndarray, training: bool = False):
        self.check_args(s, training=True, valid_dim=[2])
        return self._forward(s, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self._forward(mix[None, :], mode, False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]
