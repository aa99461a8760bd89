#!/usr/bin/env python
"""Unsupervised ML (CACGMM-style) enhancement task.

Parity surface: /root/reference/aps/task/ml.py (hermitian_det:14,
estimate_covar:38, MlEnhTask:63 "sse@enh_ml").

TPU design: real-pair complex arithmetic (aps_tpu/ops/cplx_pair) — the
hermitian determinant goes through an unrolled Cholesky of the realified
2C x 2C matrix (log det R = sum log diag L) instead of the reference's
eigvalsh, and the B^-1 @ obs quadratic form is a Cholesky solve. The TPU
runtime implements neither complex64 nor eigh, and the Cholesky route is
also cheaper (O(C^3) straight-line code vs an iterative eigensolver)."""

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.ops import cplx_pair as cp
from aps_tpu.task.base import Task


def hermitian_logdet(Bk, eps: float = EPSILON) -> jnp.ndarray:
    """log-determinant of hermitian PSD pairs. Bk: N x F x C x C pair ->
    N x F real."""
    return cp.logdet_hermitian(Bk, eps=eps)


def estimate_covar(mask: jnp.ndarray, obs, eps: float = EPSILON):
    """Masked spatial covariance. mask: N x F x T, obs: N x F x C x T
    pair -> N x F x C x C pair (hermitian-symmetrized)."""
    C = obs[0].shape[-2]
    masked = (obs[0] * mask[..., None, :], obs[1] * mask[..., None, :])
    nominator = cp.ceinsum("...it,...jt->...ij", masked, cp.conj(obs))
    denominator = jnp.maximum(
        jnp.sum(mask, -1, keepdims=True)[..., None], eps)
    Br = C * nominator[0] / denominator
    Bi = C * nominator[1] / denominator
    # hermitian part: (B + B^H) / 2
    return ((Br + jnp.swapaxes(Br, -1, -2)) / 2,
            (Bi - jnp.swapaxes(Bi, -1, -2)) / 2)


@ApsRegisters.task.register("sse@enh_ml")
class MlEnhTask(Task):
    """Maximum-likelihood unsupervised multi-channel enhancement."""
    eps: float = EPSILON

    def log_pdf(self, mask, obs):
        """mask: N x F x T, obs: N x F x C x T pair -> N x F x T."""
        C = obs[0].shape[-2]
        Bk = estimate_covar(mask, obs, eps=self.eps)
        I = jnp.eye(C, dtype=Bk[0].dtype)
        Bk = (Bk[0] + I * self.eps, Bk[1])
        logdet = hermitian_logdet(Bk, eps=self.eps)
        # K = sum_c conj(obs) * (Bk^-1 @ obs) — real-valued quadratic form
        Binv_obs = cp.chol_solve_hermitian(Bk, obs)
        K = jnp.sum(obs[0] * Binv_obs[0] + obs[1] * Binv_obs[1], -2)
        K = jnp.maximum(K, self.eps)
        return -C * jnp.log(K) - logdet[..., None]

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        """egs: {mix: N x C x S} (no references needed)."""
        obs, ms = self.nnet(egs["mix"], training=training)
        # packed N x C x F x T x 2 -> N x F x C x T pair
        obs = (jnp.swapaxes(obs[..., 0], 1, 2),
               jnp.swapaxes(obs[..., 1], 1, 2))
        # N x T x F -> N x F x T
        ms = jnp.swapaxes(ms, -1, -2)
        ps = self.log_pdf(ms, obs)
        pn = self.log_pdf(1 - ms, obs)
        log_pdf = jnp.logaddexp(ps, pn) + jnp.log(0.5)
        return {"loss": -jnp.mean(log_pdf)}
