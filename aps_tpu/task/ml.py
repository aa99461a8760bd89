#!/usr/bin/env python
"""Unsupervised ML (CACGMM-style) enhancement task.

Parity surface: /root/reference/aps/task/ml.py (hermitian_det:14,
estimate_covar:38, MlEnhTask:63 "sse@enh_ml"). Native jnp.complex64
replaces the ComplexTensor workaround; the hermitian determinant uses
eigvalsh on the realified 2C x 2C matrix like the reference."""

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.task.base import Task


def hermitian_det(Bk: jnp.ndarray, eps: float = EPSILON) -> jnp.ndarray:
    """Determinant of hermitian matrices. Bk: N x F x C x C complex ->
    N x F real."""
    m = jnp.concatenate([Bk.real, -Bk.imag], -1)
    n = jnp.concatenate([Bk.imag, Bk.real], -1)
    Rk = jnp.concatenate([m, n], -2)
    ev = jnp.linalg.eigvalsh(Rk)
    det = jnp.cumprod(ev[..., ::2], axis=-1)
    return jnp.maximum(det[..., -1], eps)


def estimate_covar(mask: jnp.ndarray, obs: jnp.ndarray,
                   eps: float = EPSILON) -> jnp.ndarray:
    """Masked spatial covariance. mask: N x F x T, obs: N x F x C x T
    (complex) -> N x F x C x C."""
    C = obs.shape[-2]
    nominator = jnp.einsum("...it,...jt->...ij", obs * mask[..., None, :],
                           jnp.conj(obs))
    denominator = jnp.maximum(
        jnp.sum(mask, -1, keepdims=True)[..., None], eps)
    Bk = C * nominator / denominator
    return (Bk + jnp.swapaxes(jnp.conj(Bk), -1, -2)) / 2


@ApsRegisters.task.register("sse@enh_ml")
class MlEnhTask(Task):
    """Maximum-likelihood unsupervised multi-channel enhancement."""
    eps: float = EPSILON

    def log_pdf(self, mask, obs):
        """mask: N x F x T, obs: N x F x C x T complex -> N x F x T."""
        C = obs.shape[-2]
        Bk = estimate_covar(mask, obs, eps=self.eps)
        I = jnp.eye(C, dtype=Bk.dtype)
        Bk = Bk + I * self.eps
        Dk = hermitian_det(Bk, eps=self.eps)
        Bk_inv = jnp.linalg.inv(Bk)
        K = jnp.sum(jnp.conj(obs) * (Bk_inv @ obs), -2)
        K = jnp.maximum(K.real, self.eps)
        return -C * jnp.log(K) - jnp.log(Dk[..., None])

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        """egs: {mix: N x C x S} (no references needed)."""
        obs, ms = self.nnet(egs["mix"], training=training)
        # N x C x F x T -> N x F x C x T
        obs = jnp.swapaxes(obs, 1, 2)
        # N x T x F -> N x F x T
        ms = jnp.swapaxes(ms, -1, -2)
        ps = self.log_pdf(ms, obs)
        pn = self.log_pdf(1 - ms, obs)
        log_pdf = jnp.logaddexp(ps, pn) + jnp.log(0.5)
        return {"loss": -jnp.mean(log_pdf)}
