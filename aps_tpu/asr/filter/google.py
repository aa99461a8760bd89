#!/usr/bin/env python
"""Google CLP / filter-and-sum beamformer front-ends.

Parity surface: /root/reference/aps/asr/filter/google.py
(UnfactedFsBeamformer:35, FactedFsBeamformer:88, ComplexLinear:155,
CLPFsBeamformer:182 "google_clp")."""

from typing import Optional

import jax.nn
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.asr.filter.conv import EnhFrontEnds, _cplx_param
from aps_tpu.transform.enh import FixedBeamformer
from aps_tpu.transform.utils import frame_signal, mel_filter


class UnfactedFsBeamformer(nn.Module):
    """Unfacted filter-and-sum beamformer on raw waveform."""
    num_taps: int = 400
    win_size: int = 560
    num_channels: int = 4
    num_filters: int = 256
    log_compress: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: N x C x S -> y: N x F x T."""
        if x.ndim == 2:
            x = x[None]
        hop = self.win_size - self.num_taps
        # frames: N x C x T x M
        frames = frame_signal(x, self.win_size, hop)
        # tap windows inside each frame: N x C x T x M' x taps
        idx = (np.arange(hop + 1)[:, None] +
               np.arange(self.num_taps)[None, :])
        taps = frames[..., idx]
        w = self.param("filter", nn.initializers.lecun_normal(),
                       (self.num_channels, self.num_filters, self.num_taps))
        # conv + sum over channels: N x F x T x M'
        f = jnp.einsum("cfk,nctmk->nftm", w, taps)
        # max pool over M', relu
        y = jax.nn.relu(jnp.max(f, axis=-1))
        if self.log_compress:
            y = jnp.log(y + 0.01)
        return y


class FactedFsBeamformer(nn.Module):
    """Facted (spatial x spectral) filter-and-sum beamformer."""
    num_taps: int = 81
    win_size: int = 560
    num_channels: int = 4
    spatial_filters: int = 10
    spectra_filters: int = 128
    spectra_kernels: int = 400
    log_compress: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: N x C x S -> y: N x P x F x T."""
        if x.ndim == 2:
            x = x[None]
        hop = self.win_size - self.spectra_kernels
        # frames: N x C x T x M
        frames = frame_signal(x, self.win_size, hop)
        # spatial filtering (same-padded conv over M): pad taps
        pad = (self.num_taps - 1) // 2
        fp = jnp.pad(frames, ((0, 0), (0, 0), (0, 0),
                              (pad, self.num_taps - 1 - pad)))
        idx = (np.arange(self.win_size)[:, None] +
               np.arange(self.num_taps)[None, :])
        taps = fp[..., idx]  # N x C x T x M x taps
        ws = self.param("spatial", nn.initializers.lecun_normal(),
                        (self.num_channels, self.spatial_filters,
                         self.num_taps))
        # N x P x T x M (summed over channels)
        f = jnp.einsum("cpk,nctmk->nptm", ws, taps)
        # spectral conv over M with kernel spectra_kernels: M' = hop+1
        idx2 = (np.arange(hop + 1)[:, None] +
                np.arange(self.spectra_kernels)[None, :])
        f2 = f[..., idx2]  # N x P x T x M' x K
        wk = self.param("spectra", nn.initializers.lecun_normal(),
                        (self.spectra_filters, self.spectra_kernels))
        w = jnp.einsum("fk,nptmk->npftm", wk, f2)
        y = jax.nn.relu(jnp.max(w, axis=-1))  # N x P x F x T
        if self.log_compress:
            y = jnp.log(y + 0.01)
        return y


class ComplexLinear(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x) -> tuple:
        """x: (real, imag) pair -> (real, imag) pair."""
        real = nn.Dense(self.out_features, use_bias=self.use_bias,
                        name="real")
        imag = nn.Dense(self.out_features, use_bias=self.use_bias,
                        name="imag")
        xr, xi = x
        return real(xr) - imag(xi), real(xi) + imag(xr)


class CLPFsBeamformer(nn.Module):
    """Complex Linear Projection beamformer (frequency domain).
    Registered "google_clp"."""
    num_bins: int = 257
    weight: Optional[str] = None
    batchnorm: bool = True
    num_channels: int = 4
    spatial_filters: int = 5
    spectra_filters: int = 128
    spectra_init: str = "random"
    spectra_complex: bool = True
    spatial_maxpool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, eps: float = 1e-5,
                 training: bool = False) -> jnp.ndarray:
        """x: N x C x F x T x 2 packed -> N x T x P*G features."""
        if self.spectra_init not in ["mel", "random"]:
            raise ValueError(f"Unsupported init: {self.spectra_init}")
        if x.ndim == 4:
            x = x[None]
        beam = FixedBeamformer(self.spatial_filters, self.num_channels,
                               self.num_bins, weight=self.weight,
                               requires_grad=True, name="beam")
        # N x P x T x F
        br, bi = beam(x[..., 0], x[..., 1], trans=True)
        if self.spectra_complex:
            wr, wi = ComplexLinear(self.num_bins, self.spectra_filters,
                                   use_bias=False, name="proj")((br, bi))
            w = jnp.sqrt(wr * wr + wi * wi + eps)
        else:
            p = jnp.sqrt(br * br + bi * bi + eps)
            if self.spectra_init == "mel":
                pw = self.param(
                    "proj", lambda *_: jnp.asarray(
                        mel_filter(None, num_bins=self.num_bins,
                                   num_mels=self.spectra_filters).T))
            else:
                pw = self.param("proj", nn.initializers.lecun_normal(),
                                (self.num_bins, self.spectra_filters))
            w = jax.nn.relu(p @ pw) + eps
        z = jnp.log(w)
        if self.batchnorm:
            # N x P x T x G, channel axis = 1
            z = nn.BatchNorm(use_running_average=not training, axis=1,
                             momentum=0.9)(z)
        # N x T x P*G
        z = jnp.swapaxes(z, 1, 2)
        return z.reshape(*z.shape[:2], -1)


EnhFrontEnds.register("google_clp")(CLPFsBeamformer)
