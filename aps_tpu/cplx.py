#!/usr/bin/env python
"""Complex tensor helpers.

Parity surface: /root/reference/aps/cplx.py (ComplexTensor:18 with +,-,*,/,
matmul, inverse, conj, abs, polar). JAX has first-class complex64 support, so
this module is a thin compatibility layer: it provides packing helpers
between the reference's [real; imag] layouts and native complex arrays, plus
a ComplexTensor alias implementing the reference API over jnp.complex64 for
any plug-in code that imports it."""

from typing import Tuple

import jax.numpy as jnp


def to_complex(packed: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """[...; 2] packed real/imag -> native complex."""
    real = jnp.take(packed, 0, axis=axis)
    imag = jnp.take(packed, 1, axis=axis)
    return real + 1j * imag


def to_packed(cplx: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """native complex -> [...; 2] packed real/imag."""
    return jnp.stack([cplx.real, cplx.imag], axis=axis)


def from_polar(mag: jnp.ndarray, pha: jnp.ndarray) -> jnp.ndarray:
    return mag * jnp.exp(1j * pha)


class ComplexTensor(object):
    """API-compatible shim over jnp.complex64 (reference aps/cplx.py)."""

    def __init__(self, real, imag=None, polar: bool = False):
        if imag is None:
            self.cplx = jnp.asarray(real, dtype=jnp.complex64)
        elif polar:
            self.cplx = from_polar(real, imag)
        else:
            self.cplx = real + 1j * imag

    @property
    def real(self):
        return self.cplx.real

    @property
    def imag(self):
        return self.cplx.imag

    @property
    def shape(self):
        return self.cplx.shape

    def dim(self):
        return self.cplx.ndim

    def abs(self):
        return jnp.abs(self.cplx)

    def angle(self):
        return jnp.angle(self.cplx)

    def conj(self):
        return ComplexTensor(jnp.conj(self.cplx))

    def transpose(self, a, b):
        return ComplexTensor(jnp.swapaxes(self.cplx, a, b))

    def conj_transpose(self, a, b):
        return ComplexTensor(jnp.swapaxes(jnp.conj(self.cplx), a, b))

    def inverse(self):
        return ComplexTensor(jnp.linalg.inv(self.cplx))

    def sum(self, axis=None, keepdims=False):
        return ComplexTensor(jnp.sum(self.cplx, axis=axis,
                                     keepdims=keepdims))

    def as_real(self):
        return to_packed(self.cplx)

    def _get(self, other):
        return other.cplx if isinstance(other, ComplexTensor) else other

    def __add__(self, other):
        return ComplexTensor(self.cplx + self._get(other))

    def __sub__(self, other):
        return ComplexTensor(self.cplx - self._get(other))

    def __mul__(self, other):
        return ComplexTensor(self.cplx * self._get(other))

    def __truediv__(self, other):
        return ComplexTensor(self.cplx / self._get(other))

    def __matmul__(self, other):
        return ComplexTensor(self.cplx @ self._get(other))

    def __getitem__(self, idx):
        return ComplexTensor(self.cplx[idx])

    def __repr__(self):
        return f"ComplexTensor({self.cplx!r})"
