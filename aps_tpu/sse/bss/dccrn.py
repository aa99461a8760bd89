#!/usr/bin/env python
"""DCCRN: deep complex convolutional-recurrent network.

Parity surface: /root/reference/aps/sse/bss/dccrn.py (LSTMP:16,
ComplexLSTMP:53, LSTMWrapper:96, DCCRN:139 "sse@dccrn"). Reuses the DCUNet
encoder/decoder blocks; the bottleneck LSTM runs on flattened (C*F)
features with complex (real/imag pair) arithmetic."""

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase
from aps_tpu.sse.enh.dcunet import (Decoder, Encoder, parse_1dstr,
                                    parse_2dstr)
from aps_tpu.asr.base.rnn import StackedRNN


class LSTMP(nn.Module):
    """LSTM + projection over N x T x C x F (flattened inner dims)."""
    in_features: int
    hidden_size: int
    num_layers: int = 2
    dropout: float = 0
    bidirectional: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        N, T, C, F = inp.shape
        x = inp.reshape(N, T, C * F)
        out = StackedRNN(self.hidden_size,
                         num_layers=self.num_layers,
                         rnn_type="lstm",
                         bidirectional=self.bidirectional,
                         dropout=self.dropout)(x, training=training)
        out = nn.Dense(C * F, use_bias=False)(out)
        return out.reshape(N, T, C, F)


class ComplexLSTMP(nn.Module):
    """Complex LSTMP: (a+bi)(c+di) composition of two real LSTMPs."""
    in_features: int
    hidden_size: int
    num_layers: int = 2
    dropout: float = 0
    bidirectional: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        """inp: N x T x C x 2F"""
        kw = dict(in_features=self.in_features,
                  hidden_size=self.hidden_size,
                  num_layers=self.num_layers,
                  dropout=self.dropout,
                  bidirectional=self.bidirectional)
        real = LSTMP(**kw, name="real")
        imag = LSTMP(**kw, name="imag")
        inp_r, inp_i = jnp.split(inp, 2, -1)
        out_r = real(inp_r, training=training) - imag(inp_i,
                                                      training=training)
        out_i = real(inp_i, training=training) + imag(inp_r,
                                                      training=training)
        return jnp.concatenate([out_r, out_i], -1)


class LSTMWrapper(nn.Module):
    """Real/complex bottleneck LSTM over N x C x (2)F x T."""
    in_features: int
    num_layers: int = 2
    dropout: float = 0
    hidden_size: int = 512
    cplx: bool = True
    bidirectional: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        # N x C x (2)F x T -> N x T x C x (2)F
        x = jnp.transpose(inp, (0, 3, 1, 2))
        cls = ComplexLSTMP if self.cplx else LSTMP
        out = cls(in_features=self.in_features,
                  hidden_size=self.hidden_size,
                  dropout=self.dropout,
                  num_layers=self.num_layers,
                  bidirectional=self.bidirectional)(x, training=training)
        return jnp.transpose(out, (0, 2, 3, 1))


@ApsRegisters.sse.register("sse@dccrn")
class DCCRN(SSEBase):
    cplx: bool = True
    K: str = "3,3;3,3;3,3;3,3;3,3;3,3;3,3"
    S: str = "2,1;2,1;2,1;2,1;2,1;2,1;2,1"
    P: str = "1,1,1,1,1,1,1"
    O: str = "0,0,0,0,0,0,0"
    C: str = "16,32,64,64,128,128,256"
    num_spks: int = 2
    connection: str = "sum"
    rnn_hidden: int = 512
    rnn_layers: int = 2
    rnn_resize: int = 1536
    rnn_dropout: float = 0
    rnn_bidir: bool = False
    causal_conv: bool = False
    share_decoder: bool = True
    non_linear: str = "tanh"
    training_mode: str = "time"

    def setup(self):
        assert self.enh_transform is not None
        self.mask_act = MaskNonLinear(self.non_linear,
                                      enable="all_wo_softmax")
        self.stft_ctx = self.enh_transform.ctx("forward_stft")
        K = parse_2dstr(self.K)
        S = parse_2dstr(self.S)
        C = parse_1dstr(self.C)
        P = parse_1dstr(self.P)
        O = parse_1dstr(self.O)
        self.enc = Encoder(self.cplx, tuple(map(tuple, K)),
                           tuple(map(tuple, S)), tuple([1] + C), tuple(P),
                           causal=self.causal_conv)
        C_dec = list(C)
        if self.connection == "cat":
            C_dec[-1] *= 2
        if self.share_decoder:
            self.decoders = [
                Decoder(self.cplx, tuple(map(tuple, K[::-1])),
                        tuple(map(tuple, S[::-1])),
                        tuple(C_dec[::-1] + [self.num_spks]),
                        tuple(P[::-1]), tuple(O[::-1]),
                        causal=self.causal_conv,
                        connection=self.connection)
            ]
        else:
            self.decoders = [
                Decoder(self.cplx, tuple(map(tuple, K[::-1])),
                        tuple(map(tuple, S[::-1])),
                        tuple(C_dec[::-1] + [1]),
                        tuple(P[::-1]), tuple(O[::-1]),
                        causal=self.causal_conv,
                        connection=self.connection)
                for _ in range(self.num_spks)
            ]
        self.rnn = LSTMWrapper(
            self.rnn_resize // 2 if self.cplx else self.rnn_resize,
            dropout=self.rnn_dropout,
            num_layers=self.rnn_layers,
            hidden_size=self.rnn_hidden,
            bidirectional=self.rnn_bidir,
            cplx=self.cplx)

    def _sep(self, m, sr, si, mode: str = "freq"):
        if self.cplx:
            mr, mi = jnp.split(m, 2, axis=-2)
            m_abs = jnp.sqrt(mr**2 + mi**2 + EPSILON)
            m_mag = self.mask_act(m_abs)
            mr, mi = m_mag * mr / m_abs, m_mag * mi / m_abs
            if mode == "freq":
                s = jnp.stack([mr, mi], -1)
            else:
                s = jnp.stack([sr * mr - si * mi, sr * mi + si * mr], -1)
                s = self.stft_ctx.inverse(s, return_polar=False)
        else:
            m = self.mask_act(m)
            if mode == "freq":
                s = m
            else:
                s = jnp.stack([sr * m, si * m], -1)
                s = self.stft_ctx.inverse(s, return_polar=False)
        return s

    def _tf_mask(self, real, imag, training: bool, eps: float = EPSILON):
        if self.cplx:
            s = jnp.concatenate([real, imag], -2)
        else:
            s = jnp.sqrt(real**2 + imag**2 + eps)
        # channel-last: N x (2)F x T x 1
        enc_h, h = self.enc(s[..., None], training=training)
        # rnn expects N x C x (2)F x T
        h_cf = jnp.transpose(h, (0, 3, 1, 2))
        out_h = self.rnn(h_cf, training=training)
        if self.connection == "sum":
            h_cf = h_cf + out_h
        else:
            h_cf = jnp.concatenate([out_h, h_cf], 1)
        h = jnp.transpose(h_cf, (0, 2, 3, 1))
        enc_h = enc_h[::-1]
        if self.share_decoder:
            masks = self.decoders[0](h, enc_h, training=training)
        else:
            masks = jnp.concatenate(
                [dec(h, enc_h, training=training) for dec in self.decoders],
                -1)
        # N x (2)F x T x C -> N x C x (2)F x T
        return jnp.transpose(masks, (0, 3, 1, 2))

    def _infer(self, mix, mode: str, training: bool):
        packed = self.stft_ctx.forward(mix, return_polar=False)
        sr, si = packed[..., 0], packed[..., 1]
        masks = self._tf_mask(sr, si, training)
        if self.num_spks == 1:
            return self._sep(masks[:, 0], sr, si, mode=mode)
        return [
            self._sep(masks[:, i], sr, si, mode=mode)
            for i in range(self.num_spks)
        ]

    def __call__(self, s: jnp.ndarray, training: bool = False):
        self.check_args(s, training=True, valid_dim=[2])
        return self._infer(s, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self._infer(mix[None, :], mode, False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]
