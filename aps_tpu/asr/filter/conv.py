#!/usr/bin/env python
"""Learned convolutional multi-channel front-ends.

Parity surface: /root/reference/aps/asr/filter/conv.py (ComplexConv1d/2d:46,55,
TimeInvariantFilter:65 "time_invar", TimeInvariantAttFilter:155
"time_invar_att", TimeVariantFilter:277 "time_variant"; EnhFrontEnds registry).

TPU design: the reference's grouped complex convs (groups=num_bins) are
per-frequency-bin complex matmuls — expressed as REAL einsums over a
real/imag weight pair (aps_tpu/ops/cplx_pair), which XLA maps onto the MXU
without grouped-conv lowering and without a complex64 dtype (the TPU
runtime has none). Spectra arrive packed `... x 2`."""

from typing import Optional, Union

import jax.nn
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.asr.base.encoder import PyTorchRNNEncoder
from aps_tpu.libs import Register
from aps_tpu.ops import cplx_pair as cp
from aps_tpu.transform.utils import mel_filter

EnhFrontEnds = Register("enh_filter")


def _cplx_param(module, name, shape):
    """Complex weight as a (real, imag) pair of real params."""
    init = nn.initializers.lecun_normal()
    wr = module.param(f"{name}_real", init, shape)
    wi = module.param(f"{name}_imag", init, shape)
    return wr, wi


class TimeInvariantFilter(nn.Module):
    """Per-bin time-invariant complex beamforming + spectra projection.
    Registered "time_invar"."""
    num_bins: int = 257
    weight: Optional[str] = None
    num_channels: int = 4
    spatial_filters: int = 8
    spectra_filters: int = 80
    spectra_init: str = "random"
    batchnorm: bool = True
    apply_log: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, eps: float = 1e-5,
                 training: bool = False) -> jnp.ndarray:
        """x: N x C x F x T x 2 packed -> N x T x B*D features."""
        if self.spectra_init not in ["mel", "random"]:
            raise ValueError(f"Unsupported init: {self.spectra_init}")
        N, C, F, T = x.shape[:4]
        assert C == self.num_channels
        # per-bin beamforming: N x B x F x T
        w = _cplx_param(self, "beam",
                       (F, self.spatial_filters, self.num_channels))
        b = cp.ceinsum("fbc,ncft->nbft", w, cp.from_packed(x))
        b = cp.cabs(b, eps=eps)
        # spectra projection F -> D
        if self.spectra_init == "mel":
            proj_init = lambda *_: jnp.asarray(
                mel_filter(None, num_bins=self.num_bins,
                           num_mels=self.spectra_filters).T)
        else:
            proj_init = nn.initializers.lecun_normal()
        pw = self.param("proj", proj_init, (F, self.spectra_filters))
        f = jax.nn.relu(jnp.einsum("nbft,fd->nbtd", b, pw))
        if self.apply_log:
            f = jnp.log(f + eps)
        if self.batchnorm:
            # over the spatial-filter channel (N x B x T x D, axis=1)
            f = nn.BatchNorm(use_running_average=not training, axis=1,
                             momentum=0.9)(f)
        # N x T x B*D
        f = jnp.swapaxes(f, 1, 2).reshape(N, T, -1)
        return f


EnhFrontEnds.register("time_invar")(TimeInvariantFilter)


class TimeInvariantAttFilter(nn.Module):
    """Time-invariant front-end with beam attention. "time_invar_att"."""
    num_bins: int = 257
    weight: Optional[str] = None
    num_channels: int = 4
    spatial_filters: int = 8
    spectra_filters: int = 80
    spectra_init: str = "random"
    query_type: str = "rnn"
    batchnorm: bool = True
    apply_log: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, eps: float = 1e-5,
                 training: bool = False) -> jnp.ndarray:
        """x: N x C x F x T x 2 packed -> N x T x D."""
        if self.query_type not in ["rnn", "conv"]:
            raise ValueError(f"Unsupported query type: {self.query_type}")
        N, C, F, T = x.shape[:4]
        assert C == self.num_channels
        xp = cp.from_packed(x)

        def beam(name, nb):
            w = _cplx_param(self, name, (F, nb, self.num_channels))
            b = cp.ceinsum("fbc,ncft->ntfb", w, xp)
            return cp.cabs(b, eps=eps)

        if self.query_type == "conv":
            bq = beam("query", 1)[..., 0]  # N x T x F
        else:
            x_ch0 = cp.cabs((xp[0][:, 0], xp[1][:, 0]), eps=eps)  # N x F x T
            bq, _ = PyTorchRNNEncoder(inp_features=F, out_features=F,
                                      dropout=0.2, hidden=512,
                                      name="pred_q")(
                                          jnp.swapaxes(x_ch0, 1, 2), None,
                                          training=training)
            bq = jax.nn.relu(bq)
        bv = beam("value", self.spatial_filters)  # N x T x F x B
        bk = beam("key", self.spatial_filters)
        s = jnp.sum(bq[..., None] * bk, -2)  # N x T x B
        s = jnp.mean(s, -2, keepdims=True)   # N x 1 x B
        w = jax.nn.softmax(s, -1)
        v = jnp.sum(w[:, None] * bv, -1)     # N x T x F
        if self.spectra_init == "mel":
            proj_init = lambda *_: jnp.asarray(
                mel_filter(None, num_bins=self.num_bins,
                           num_mels=self.spectra_filters).T)
        else:
            proj_init = nn.initializers.lecun_normal()
        pw = self.param("proj", proj_init, (F, self.spectra_filters))
        f = jax.nn.relu(v @ pw)
        if self.apply_log:
            f = jnp.log(f + eps)
        if self.batchnorm:
            f = nn.BatchNorm(use_running_average=not training, axis=-1,
                             momentum=0.9)(f)
        return f


EnhFrontEnds.register("time_invar_att")(TimeInvariantAttFilter)


class TimeVariantFilter(nn.Module):
    """Per-bin time-variant complex filtering. "time_variant"."""
    num_bins: int = 257
    num_channels: int = 4
    time_reception: int = 11
    spatial_filters: int = 8
    spectra_filters: int = 80
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, eps: float = 1e-5,
                 training: bool = False) -> jnp.ndarray:
        """x: N x C x F x T x 2 packed -> N x T x B*D."""
        N, C, F, T = x.shape[:4]
        assert C == self.num_channels
        R = self.time_reception
        pad = (R - 1) // 2
        # pad time and gather reception windows: N x C x F x T x R
        idx = (np.arange(T)[:, None] + np.arange(R)[None, :])

        def windows(part):
            padded = jnp.pad(part, ((0, 0), (0, 0), (0, 0),
                                    (pad, R - 1 - pad)))
            return padded[..., idx]

        xw = (windows(x[..., 0]), windows(x[..., 1]))
        w = _cplx_param(
            self, "filter",
            (F, self.spatial_filters, R, self.num_channels))
        b = cp.ceinsum("fbrc,ncftr->nbft", w, xw)
        b = cp.cabs(b, eps=eps)
        pw = self.param("proj", nn.initializers.lecun_normal(),
                        (F, self.spectra_filters))
        f = jnp.einsum("nbft,fd->nbtd", b, pw)
        f = jnp.log(jax.nn.relu(f) + eps)
        if self.batchnorm:
            f = nn.BatchNorm(use_running_average=not training, axis=1,
                             momentum=0.9)(f)
        f = jnp.swapaxes(f, 1, 2).reshape(N, T, -1)
        return f


EnhFrontEnds.register("time_variant")(TimeVariantFilter)
