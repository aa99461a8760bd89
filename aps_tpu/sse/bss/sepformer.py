#!/usr/bin/env python
"""SepFormer (time & frequency domain).

Parity surface: /root/reference/aps/sse/bss/sepformer.py (Transformer:17,
SepFormer:57, TimeSeqFormer:115 "sse@time_sepformer", FreqSeqFormer:188
"sse@freq_sepformer")."""

from typing import Dict, List, Optional, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.transformer.encoder import TransformerEncoder
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking
from aps_tpu.sse.bss.tcn import NormalizeLayer
from aps_tpu.transform.utils import frame_signal, overlap_add


class ChunkTransformer(nn.Module):
    """Transformer over the axis currently second of N x K x L x C."""
    arch: str = "xfmr"
    num_layers: int = 2
    arch_kwargs: Dict = None

    @nn.compact
    def __call__(self, chunk: jnp.ndarray, training: bool = False):
        """chunk: N x K x L x C -> N x L x K x C."""
        N, K, L, C = chunk.shape
        chunk = jnp.swapaxes(chunk, 1, 2).reshape(N * L, K, C)
        xfmr = TransformerEncoder(arch=self.arch,
                                  input_size=-1,
                                  num_layers=self.num_layers,
                                  proj="none",
                                  pose="abs",
                                  arch_kwargs=self.arch_kwargs)
        chunk, _ = xfmr(chunk, None, training=training)
        return chunk.reshape(N, L, K, C)


class SepFormer(nn.Module):
    """Dual-path transformer separator + mask head."""
    arch: str
    num_bins: int = 256
    num_spks: int = 2
    num_blocks: int = 2
    num_layers: int = 2
    chunk_size: int = 320
    arch_kwargs: Dict = None

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        """inp: N x C x T -> masks N x S*C x T."""
        N, C, T = inp.shape
        K = self.chunk_size
        hop = K // 2
        att_dim = (self.arch_kwargs or {})["att_dim"]
        # N x C x L x K -> N x L x K x C
        chunks = jnp.transpose(frame_signal(inp, K, hop), (0, 2, 3, 1))
        chunks = nn.Dense(att_dim)(chunks)
        for i in range(self.num_blocks * 2):
            chunks = ChunkTransformer(arch=self.arch,
                                      num_layers=self.num_layers,
                                      arch_kwargs=self.arch_kwargs,
                                      name=f"xfmr_{i}")(chunks,
                                                        training=training)
        chunks = nn.PReLU()(chunks)
        chunks = nn.Dense(self.num_bins)(chunks)
        # N x C x L x K -> fold to N x C x T (zero-pad tail like torch fold)
        out = overlap_add(jnp.transpose(chunks, (0, 3, 1, 2)), hop)
        if out.shape[-1] < T:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) +
                          [(0, T - out.shape[-1])])
        out = out[..., :T]
        # mask head: 1x1 conv over channel dim
        out = jnp.swapaxes(out, 1, 2)  # N x T x C
        out = nn.Dense(self.num_bins * self.num_spks)(out)
        return jnp.swapaxes(out, 1, 2)


@ApsRegisters.sse.register("sse@time_sepformer")
class TimeSepFormer(SSEBase):
    arch: str = "xfmr"
    stride: int = 8
    kernel: int = 16
    num_bins: int = 256
    num_spks: int = 2
    non_linear: str = "relu"
    num_blocks: int = 2
    num_layers: int = 2
    chunk_size: int = 320
    arch_kwargs: Dict = None
    training_mode: str = "time"

    def setup(self):
        self.encoder = nn.Conv(self.num_bins, (self.kernel,),
                               strides=(self.stride,), padding="VALID")
        self.enc_norm = NormalizeLayer("cLN", self.num_bins)
        self.separator = SepFormer(self.arch,
                                   num_bins=self.num_bins,
                                   num_spks=self.num_spks,
                                   num_blocks=self.num_blocks,
                                   num_layers=self.num_layers,
                                   chunk_size=self.chunk_size,
                                   arch_kwargs=self.arch_kwargs or {})
        self.mask_act = MaskNonLinear(self.non_linear,
                                      enable="positive_wo_softmax")
        self.decoder = nn.ConvTranspose(1, (self.kernel,),
                                        strides=(self.stride,),
                                        padding="VALID")

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2])
        w = self.enc_norm(jax.nn.relu(self.encoder(mix[..., None])))
        w_t = jnp.swapaxes(w, 1, 2)  # N x C x T
        m = self.mask_act(self.separator(w_t, training=training))
        m = jnp.split(m, self.num_spks, axis=1)
        bss = [
            self.decoder(jnp.swapaxes(w_t * m[n], 1, 2))[..., 0]
            for n in range(self.num_spks)
        ]
        return bss[0] if self.num_spks == 1 else bss

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self.__call__(mix[None, ...], training=False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]


@ApsRegisters.sse.register("sse@freq_sepformer")
class FreqSepFormer(SSEBase):
    arch: str = "xfmr"
    num_bins: int = 257
    num_spks: int = 2
    non_linear: str = "relu"
    num_blocks: int = 2
    num_layers: int = 2
    chunk_size: int = 64
    arch_kwargs: Dict = None
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        self.separator = SepFormer(self.arch,
                                   num_bins=self.num_bins,
                                   num_spks=self.num_spks,
                                   num_blocks=self.num_blocks,
                                   num_layers=self.num_layers,
                                   chunk_size=self.chunk_size,
                                   arch_kwargs=self.arch_kwargs or {})
        self.mask_act = MaskNonLinear(self.non_linear, enable="common")

    def _forward(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        masks = self.mask_act(
            self.separator(jnp.swapaxes(feats, 1, 2), training=training))
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
