#!/usr/bin/env python
"""Dual-path RNN separation (time & frequency domain).

Parity surface: /root/reference/aps/sse/bss/dprnn.py (LSTMBlock:18, DPRNN:60,
TimeDPRNN:118 "sse@time_dprnn", FreqDPRNN:194 "sse@freq_dprnn").
Chunking (unfold/fold) is a strided gather + overlap-add scatter."""

from typing import List, Optional, Union

import jax.nn
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.asr.base.rnn import SingleRNN
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking
from aps_tpu.sse.bss.tcn import NormalizeLayer
from aps_tpu.transform.utils import frame_signal, overlap_add


class LSTMBlock(nn.Module):
    """LSTM + proj + LN + residual along the L axis of N x L x K x C."""
    input_size: int
    hidden_size: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, chunk: jnp.ndarray) -> jnp.ndarray:
        """chunk: N x L x K x C -> N x K x L x C (axes swapped, as in the
        reference: each block models the axis currently second)."""
        N, L, K, C = chunk.shape
        chunk = jnp.swapaxes(chunk, 1, 2).reshape(N * K, L, C)
        rnn_out = SingleRNN(self.hidden_size, rnn_type="lstm",
                            bidirectional=self.bidirectional)(chunk)
        rnn_out = nn.LayerNorm()(nn.Dense(self.input_size)(rnn_out))
        out = chunk + rnn_out
        return out.reshape(N, K, L, C)


class DPRNN(nn.Module):
    """Alternating intra/inter chunk LSTM blocks + mask head."""
    num_bins: int = 256
    num_spks: int = 2
    num_layers: int = 2
    chunk_size: int = 320
    rnn_hidden: int = 128
    bidirectional: bool = True

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        """inp: N x C x T -> masks N x S*C x T"""
        N, C, T = inp.shape
        K = self.chunk_size
        hop = K // 2
        # N x C x L x K via framing the time axis
        chunks = frame_signal(inp, K, hop)
        # N x L x K x C
        chunks = jnp.transpose(chunks, (0, 2, 3, 1))
        for i in range(self.num_layers * 2):
            chunks = LSTMBlock(
                self.num_bins, self.rnn_hidden,
                bidirectional=True if i % 2 == 0 else self.bidirectional,
                name=f"block_{i}")(chunks)
        # after an even number of blocks axes are back to N x L x K x C
        chunks = nn.PReLU()(chunks)
        # N x L x K x S*C
        chunks = nn.Dense(self.num_bins * self.num_spks)(chunks)
        # N x S*C x L x K
        chunks = jnp.transpose(chunks, (0, 3, 1, 2))
        # overlap-add back to N x S*C x T
        out = overlap_add(chunks, hop)
        # zero-pad the tail like torch fold(output_size=T)
        if out.shape[-1] < T:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) +
                          [(0, T - out.shape[-1])])
        return out[..., :T]


@ApsRegisters.sse.register("sse@time_dprnn")
class TimeDPRNN(SSEBase):
    """Time-domain dual-path RNN."""
    num_spks: int = 2
    num_bins: int = 64
    kernel: int = 16
    stride: int = 8
    chunk_size: int = 100
    num_layers: int = 6
    bidirectional: bool = True
    rnn_hidden: int = 128
    non_linear: str = "relu"
    training_mode: str = "time"

    def setup(self):
        self.encoder = nn.Conv(self.num_bins, (self.kernel,),
                               strides=(self.stride,), padding="VALID",
                               use_bias=False)
        self.enc_norm = NormalizeLayer("cLN", self.num_bins)
        self.separator = DPRNN(num_bins=self.num_bins,
                               num_spks=self.num_spks,
                               num_layers=self.num_layers,
                               chunk_size=self.chunk_size,
                               rnn_hidden=self.rnn_hidden,
                               bidirectional=self.bidirectional)
        self.mask_act = MaskNonLinear(self.non_linear,
                                      enable="positive_wo_softmax")
        self.decoder = nn.ConvTranspose(1, (self.kernel,),
                                        strides=(self.stride,),
                                        padding="VALID", use_bias=False)

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        """mix: N x S -> [N x S', ...]"""
        self.check_args(mix, training=True, valid_dim=[2])
        # N x T x F
        w = self.enc_norm(jax.nn.relu(self.encoder(mix[..., None])))
        # N x F x T
        w_t = jnp.swapaxes(w, 1, 2)
        mask = self.mask_act(self.separator(w_t))
        m = jnp.split(mask, self.num_spks, axis=1)
        bss = [
            self.decoder(jnp.swapaxes(w_t * m[n], 1, 2))[..., 0]
            for n in range(self.num_spks)
        ]
        return bss[0] if self.num_spks == 1 else bss

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self.__call__(mix[None, ...], training=False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]


@ApsRegisters.sse.register("sse@freq_dprnn")
class FreqDPRNN(SSEBase):
    """Frequency-domain dual-path RNN."""
    num_spks: int = 2
    num_bins: int = 257
    non_linear: str = "relu"
    chunk_size: int = 64
    num_layers: int = 6
    rnn_hidden: int = 256
    bidirectional: bool = True
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        self.separator = DPRNN(num_bins=self.num_bins,
                               num_spks=self.num_spks,
                               num_layers=self.num_layers,
                               chunk_size=self.chunk_size,
                               rnn_hidden=self.rnn_hidden,
                               bidirectional=self.bidirectional)
        self.mask_act = MaskNonLinear(self.non_linear, enable="common")

    def _forward(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        # N x F x T
        masks = self.mask_act(self.separator(jnp.swapaxes(feats, 1, 2)))
        masks = jnp.split(masks, self.num_spks, axis=1)
        if mode == "time":
            bss_stft = [tf_masking(stft, m) for m in masks]
            bss = self.enh_transform.decode(bss_stft)
        else:
            bss = masks
        return bss[0] if self.num_spks == 1 else bss

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2])
        return self._forward(mix, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        ret = self._forward(mix[None, :], mode, False)
        return ret[0] if self.num_spks == 1 else [r[0] for r in ret]
