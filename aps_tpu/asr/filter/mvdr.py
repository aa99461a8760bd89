#!/usr/bin/env python
"""Mask-based MVDR beamforming front-end.

Parity surface: /root/reference/aps/asr/filter/mvdr.py (trace:19,
estimate_covar:42, MvdrBeamformer:65, ChannelAttention:151, RNNMaskMvdr:176
"rnn_mask_mvdr"). Native jnp.complex64 throughout."""

from typing import Optional

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.base.encoder import PyTorchRNNEncoder
from aps_tpu.asr.filter.conv import EnhFrontEnds
from aps_tpu.const import EPSILON


def trace(cplx_mat: jnp.ndarray) -> jnp.ndarray:
    """Trace of ... x C x C complex matrices."""
    return jnp.trace(cplx_mat, axis1=-2, axis2=-1)


def beamform(weight: jnp.ndarray, spectrogram: jnp.ndarray) -> jnp.ndarray:
    """weight: N x C x F, spectrogram: N x C x F x T -> N x F x T."""
    return jnp.sum(jnp.conj(weight)[..., None] * spectrogram, axis=1)


def estimate_covar(mask: jnp.ndarray, spectrogram: jnp.ndarray):
    """mask: N x F x T, spectrogram: N x C x F x T -> PSD N x F x C x C."""
    # N x F x C x T
    spec = jnp.swapaxes(spectrogram, 1, 2)
    mask = mask[:, :, None, :]
    nominator = jnp.einsum("...it,...jt->...ij", spec * mask,
                           jnp.conj(spec))
    # N x F x 1 x 1 broadcast over C x C
    denominator = jnp.maximum(jnp.sum(mask, -1, keepdims=True), EPSILON)
    return nominator / denominator


class ChannelAttention(nn.Module):
    """Reference-channel selection vector u from the speech PSD."""
    num_bins: int
    att_dim: int

    @nn.compact
    def __call__(self, Rs: jnp.ndarray) -> jnp.ndarray:
        """Rs: N x F x C x C complex -> u: N x C."""
        C = Rs.shape[-1]
        eye = jnp.eye(C, dtype=bool)
        Rs = jnp.where(eye, 0, Rs).sum(-1) / (C - 1)  # N x F x C
        proj = nn.Dense(self.att_dim)(jnp.abs(jnp.swapaxes(Rs, 1, 2)))
        gvec = nn.Dense(1)(jnp.tanh(proj))
        return jax.nn.softmax(gvec[..., 0], -1)


class MvdrBeamformer(nn.Module):
    """MVDR beamformer with channel-attention reference selection."""
    num_bins: int
    att_dim: int = 512
    mask_norm: bool = True
    eps: float = 1e-5

    def _derive_weight(self, Rs, Rn, u, eps: float = 1e-5):
        """Rs/Rn: N x F x C x C, u: N x C -> weight N x F x C."""
        C = Rn.shape[-1]
        I = jnp.eye(C, dtype=Rn.dtype)
        Rn = Rn + I * eps
        Rn_inv = jnp.linalg.inv(Rn)
        Rn_inv_Rs = Rn_inv @ Rs
        tr = trace(Rn_inv_Rs) + eps
        Rn_inv_Rs_u = jnp.sum(Rn_inv_Rs * u[:, None, None, :], -1)
        return Rn_inv_Rs_u / tr[..., None]

    def _process_mask(self, mask, x_len):
        if mask is None:
            return None
        if x_len is not None:
            zero_mask = padding_mask(x_len, mask.shape[1])
            mask = jnp.where(zero_mask[..., None], 0, mask)
        if self.mask_norm:
            max_abs = jnp.max(jnp.abs(mask), axis=1, keepdims=True)
            mask = mask / (max_abs + EPSILON)
        return jnp.swapaxes(mask, 1, 2)

    @nn.compact
    def __call__(self, mask_s, x, mask_n=None, x_len=None):
        """mask_s: N x T x F (real), x: N x C x F x T complex ->
        enhanced N x T x F complex."""
        mask_s = self._process_mask(mask_s, x_len)
        mask_n = self._process_mask(mask_n, x_len)
        Rs = estimate_covar(mask_s, x)
        Rn = estimate_covar(1 - mask_s if mask_n is None else mask_n, x)
        u = ChannelAttention(self.num_bins, self.att_dim, name="ref")(Rs)
        weight = self._derive_weight(Rs, Rn, u, eps=self.eps)
        weight = jnp.swapaxes(weight, 1, 2)  # N x C x F
        beam = beamform(weight, x)
        return jnp.swapaxes(beam, 1, 2)


class RNNMaskMvdr(nn.Module):
    """RNN mask estimator + MVDR beamformer. Registered "rnn_mask_mvdr"."""
    enh_input_size: int
    num_bins: int = 257
    rnn_inp_proj: int = -1
    rnn: str = "lstm"
    num_layers: int = 3
    dropout: float = 0.0
    hidden_size: int = 640
    bidirectional: bool = True
    mask_net_noise: bool = True
    mvdr_att_dim: int = 512
    mask_norm: bool = True

    @nn.compact
    def __call__(self, feats, cstft, eps: float = 1e-5, inp_len=None,
                 training: bool = False):
        """feats: N x T x F, cstft: N x C x F x T complex ->
        enhanced N x T x F complex."""
        out_bins = self.num_bins * 2 if self.mask_net_noise else \
            self.num_bins
        mask, _ = PyTorchRNNEncoder(inp_features=self.enh_input_size,
                                    out_features=out_bins,
                                    input_proj=self.rnn_inp_proj,
                                    rnn=self.rnn,
                                    num_layers=self.num_layers,
                                    hidden=self.hidden_size,
                                    dropout=self.dropout,
                                    bidirectional=self.bidirectional,
                                    non_linear="sigmoid",
                                    name="mask_net")(feats, inp_len,
                                                     training=training)
        if self.mask_net_noise:
            mask_s, mask_n = jnp.split(mask, 2, axis=-1)
        else:
            mask_s, mask_n = mask, None
        return MvdrBeamformer(self.num_bins, att_dim=self.mvdr_att_dim,
                              mask_norm=self.mask_norm,
                              name="mvdr_net")(mask_s, cstft, mask_n=mask_n,
                                               x_len=inp_len)


EnhFrontEnds.register("rnn_mask_mvdr")(RNNMaskMvdr)
