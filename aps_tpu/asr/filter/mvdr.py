#!/usr/bin/env python
"""Mask-based MVDR beamforming front-end.

Parity surface: /root/reference/aps/asr/filter/mvdr.py (trace:19,
estimate_covar:42, MvdrBeamformer:65, ChannelAttention:151, RNNMaskMvdr:176
"rnn_mask_mvdr").

TPU design: all complex arithmetic is real-pair (aps_tpu/ops/cplx_pair) —
spectra flow as packed `... x 2` arrays and the noise-covariance solve is
an unrolled small-matrix Cholesky, because the TPU runtime implements
neither complex64 nor an `inv` over complex inputs. Numerically identical
to the complex formulation (tests/test_nnet_asr.py::test_enh_att_asr,
tests/tpu/test_on_chip.py::test_mvdr_matches_numpy_complex)."""

from typing import Optional

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.base.encoder import PyTorchRNNEncoder
from aps_tpu.asr.filter.conv import EnhFrontEnds
from aps_tpu.const import EPSILON
from aps_tpu.ops import cplx_pair as cp


def trace(pair) -> jnp.ndarray:
    """Trace of ... x C x C complex pairs."""
    return (jnp.trace(pair[0], axis1=-2, axis2=-1),
            jnp.trace(pair[1], axis1=-2, axis2=-1))


def beamform(weight, spectrogram) -> tuple:
    """weight pair: N x C x F, spectrogram pair: N x C x F x T ->
    N x F x T pair (sum_c conj(w) * x)."""
    wr, wi = weight[0][..., None], weight[1][..., None]
    xr, xi = spectrogram
    real = jnp.sum(wr * xr + wi * xi, axis=1)
    imag = jnp.sum(wr * xi - wi * xr, axis=1)
    return real, imag


def estimate_covar(mask: jnp.ndarray, spectrogram):
    """mask: N x F x T, spectrogram pair: N x C x F x T ->
    PSD pair N x F x C x C."""
    # N x F x C x T
    spec = (jnp.swapaxes(spectrogram[0], 1, 2),
            jnp.swapaxes(spectrogram[1], 1, 2))
    mask = mask[:, :, None, :]
    masked = (spec[0] * mask, spec[1] * mask)
    nominator = cp.ceinsum("...it,...jt->...ij", masked, cp.conj(spec))
    # N x F x 1 x 1 broadcast over C x C
    denominator = jnp.maximum(jnp.sum(mask, -1, keepdims=True), EPSILON)
    return nominator[0] / denominator, nominator[1] / denominator


class ChannelAttention(nn.Module):
    """Reference-channel selection vector u from the speech PSD."""
    num_bins: int
    att_dim: int

    @nn.compact
    def __call__(self, Rs) -> jnp.ndarray:
        """Rs pair: N x F x C x C -> u: N x C."""
        C = Rs[0].shape[-1]
        eye = jnp.eye(C, dtype=bool)
        Rr = jnp.where(eye, 0, Rs[0]).sum(-1) / (C - 1)  # N x F x C
        Ri = jnp.where(eye, 0, Rs[1]).sum(-1) / (C - 1)
        mag = cp.cabs((Rr, Ri))
        proj = nn.Dense(self.att_dim)(jnp.swapaxes(mag, 1, 2))
        gvec = nn.Dense(1)(jnp.tanh(proj))
        return jax.nn.softmax(gvec[..., 0], -1)


class MvdrBeamformer(nn.Module):
    """MVDR beamformer with channel-attention reference selection."""
    num_bins: int
    att_dim: int = 512
    mask_norm: bool = True
    eps: float = 1e-5

    def _derive_weight(self, Rs, Rn, u, eps: float = 1e-5):
        """Rs/Rn pairs: N x F x C x C, u: N x C -> weight pair N x F x C."""
        C = Rn[0].shape[-1]
        I = jnp.eye(C, dtype=Rn[0].dtype)
        Rn = (Rn[0] + I * eps, Rn[1])
        # inv(Rn) @ Rs via hermitian Cholesky solve (unrolled; C is small)
        Rn_inv_Rs = cp.chol_solve_hermitian(Rn, Rs)
        tr_r, tr_i = trace(Rn_inv_Rs)
        Rn_inv_Rs_u = (jnp.sum(Rn_inv_Rs[0] * u[:, None, None, :], -1),
                       jnp.sum(Rn_inv_Rs[1] * u[:, None, None, :], -1))
        # complex divide by (tr + eps): N x F -> broadcast over C
        dr = (tr_r + eps)[..., None]
        di = tr_i[..., None]
        denom = dr * dr + di * di
        wr = (Rn_inv_Rs_u[0] * dr + Rn_inv_Rs_u[1] * di) / denom
        wi = (Rn_inv_Rs_u[1] * dr - Rn_inv_Rs_u[0] * di) / denom
        return wr, wi

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
        """mask_s: N x T x F (real), x: N x C x F x T x 2 packed ->
        enhanced N x T x F x 2 packed."""
        xp = cp.from_packed(x)
        mask_s = self._process_mask(mask_s, x_len)
        mask_n = self._process_mask(mask_n, x_len)
        Rs = estimate_covar(mask_s, xp)
        Rn = estimate_covar(1 - mask_s if mask_n is None else mask_n, xp)
        u = ChannelAttention(self.num_bins, self.att_dim, name="ref")(Rs)
        weight = self._derive_weight(Rs, Rn, u, eps=self.eps)
        weight = (jnp.swapaxes(weight[0], 1, 2),
                  jnp.swapaxes(weight[1], 1, 2))  # N x C x F
        beam = beamform(weight, xp)
        return cp.to_packed((jnp.swapaxes(beam[0], 1, 2),
                             jnp.swapaxes(beam[1], 1, 2)))


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
        """feats: N x T x F, cstft: N x C x F x T x 2 packed ->
        enhanced N x T x F x 2 packed."""
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
