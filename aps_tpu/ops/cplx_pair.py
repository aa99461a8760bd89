#!/usr/bin/env python
"""Real-pair complex arithmetic for TPU backends without complex64.

The transform stack already moves spectra as packed real arrays
(`... x 2`, real/imag in the trailing dim — see transform/enh.py StftCtx).
This module provides the linear algebra the multi-channel front-ends and
the CACGMM task need ON TOP of that representation, so no jnp.complex64
array is ever materialized on device (the bench TPU plugin rejects even
complex array creation; see tests/tpu/test_on_chip.py).

Everything here lowers to real matmuls + elementwise ops:
  * `ceinsum` — complex einsum as 4 real einsums (MXU-friendly)
  * `chol_solve_hermitian` / `inv_hermitian` / `logdet_hermitian` —
    small-matrix hermitian solves via the real 2Cx2C embedding
    M = [[R, -I], [I, R]] and an UNROLLED Cholesky (C is the mic count,
    <= 8; static python loops compile to straight-line XLA — no
    `jnp.linalg.cholesky`/`eigh`/`inv` primitive needed, which this TPU
    runtime does not implement)

Parity: replaces the complex64 internals of aps/asr/filter/{mvdr,conv,
google}.py and aps/task/ml.py with numerically identical real math."""

from typing import Tuple

import jax.numpy as jnp

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def from_packed(packed: jnp.ndarray) -> Pair:
    """... x 2 packed -> (real, imag)."""
    return packed[..., 0], packed[..., 1]


def to_packed(pair: Pair) -> jnp.ndarray:
    """(real, imag) -> ... x 2 packed."""
    return jnp.stack(pair, axis=-1)


def conj(a: Pair) -> Pair:
    return a[0], -a[1]


def cabs(a: Pair, eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(a[0] * a[0] + a[1] * a[1] + eps)


def cmul(a: Pair, b: Pair) -> Pair:
    """Elementwise complex multiply."""
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def ceinsum(subscripts: str, a: Pair, b: Pair) -> Pair:
    """Complex einsum over real pairs: 4 real einsums."""
    rr = jnp.einsum(subscripts, a[0], b[0])
    ii = jnp.einsum(subscripts, a[1], b[1])
    ri = jnp.einsum(subscripts, a[0], b[1])
    ir = jnp.einsum(subscripts, a[1], b[0])
    return rr - ii, ri + ir


def matmul(a: Pair, b: Pair) -> Pair:
    return (a[0] @ b[0] - a[1] @ b[1], a[0] @ b[1] + a[1] @ b[0])


def real_embed(R: Pair) -> jnp.ndarray:
    """Hermitian ... x C x C pair -> real ... x 2C x 2C embedding
    [[Re, -Im], [Im, Re]] (symmetric PSD iff R is hermitian PSD)."""
    Rr, Ri = R
    top = jnp.concatenate([Rr, -Ri], -1)
    bot = jnp.concatenate([Ri, Rr], -1)
    return jnp.concatenate([top, bot], -2)


def cholesky_unrolled(M: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Cholesky of small SPD matrices ... x K x K via a static unrolled
    loop (K is a compile-time constant; each step is batched elementwise
    math, so this runs on any backend and XLA fully fuses it)."""
    K = M.shape[-1]
    cols = []  # K columns, each ... x K
    for j in range(K):
        # v_j = M[:, j] - sum_{k<j} L[j, k] * L[:, k]
        v = M[..., :, j]
        for k in range(j):
            v = v - cols[k][..., j:j + 1] * cols[k]
        d = jnp.sqrt(jnp.maximum(v[..., j], eps))
        col = v / d[..., None]
        # zero the strictly-upper part of this column
        mask = jnp.arange(K) >= j
        col = jnp.where(mask, col, 0)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _forward_sub(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L Y = B (L lower-triangular ... x K x K, B ... x K x M)."""
    K = L.shape[-1]
    rows = []
    for i in range(K):
        acc = B[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k:k + 1] * rows[k]
        rows.append(acc / L[..., i, i:i + 1])
    return jnp.stack(rows, axis=-2)


def _backward_sub(L: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = Y."""
    K = L.shape[-1]
    rows = [None] * K
    for i in range(K - 1, -1, -1):
        acc = Y[..., i, :]
        for k in range(i + 1, K):
            acc = acc - L[..., k, i:i + 1] * rows[k]
        rows[i] = acc / L[..., i, i:i + 1]
    return jnp.stack(rows, axis=-2)


def chol_solve_hermitian(R: Pair, B: Pair, eps: float = 1e-10) -> Pair:
    """Solve R X = B for hermitian PSD R (... x C x C pair) and complex
    rhs B (... x C x M pair) through the real 2Cx2C embedding."""
    M = real_embed(R)
    L = cholesky_unrolled(M, eps=eps)
    rhs = jnp.concatenate([B[0], B[1]], -2)  # ... x 2C x M
    X = _backward_sub(L, _forward_sub(L, rhs))
    C = R[0].shape[-1]
    return X[..., :C, :], X[..., C:, :]


def inv_hermitian(R: Pair, eps: float = 1e-10) -> Pair:
    C = R[0].shape[-1]
    eye = jnp.broadcast_to(jnp.eye(C, dtype=R[0].dtype),
                           R[0].shape)
    zero = jnp.zeros_like(eye)
    return chol_solve_hermitian(R, (eye, zero), eps=eps)


def logdet_hermitian(R: Pair, eps: float = 1e-10) -> jnp.ndarray:
    """log det of hermitian PSD R: det(embed(R)) = det(R)^2 and
    logdet(embed) = 2 sum log diag(L), so logdet(R) = sum log diag(L)."""
    L = cholesky_unrolled(real_embed(R), eps=eps)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.sum(jnp.log(jnp.maximum(diag, eps)), -1)
