#!/usr/bin/env python
"""Pallas flash-attention kernel vs dense reference (interpret mode on CPU).

Covers the dot-product attention semantics of the reference's
aps/asr/transformer/impl.py (padding mask, causal mask, additive
relative-position bias) and the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.ops.pallas import flash_attention, mha_reference


def _rand_qkv(rng, B, H, Tq, Tk, D):
    q = jnp.asarray(rng.standard_normal((B, H, Tq, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Tk, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Tk, D)), dtype=jnp.float32)
    return q, k, v


@pytest.mark.parametrize("Tq,Tk,causal", [(256, 256, False), (256, 256, True),
                                          (200, 300, False)])
def test_flash_forward(rng, Tq, Tk, causal):
    B, H, D = 2, 2, 32
    q, k, v = _rand_qkv(rng, B, H, Tq, Tk, D)
    k_len = jnp.asarray([Tk, Tk - 77], dtype=jnp.int32)
    ref = mha_reference(q, k, v, k_len=k_len, causal=causal)
    out = flash_attention(q, k, v, k_len=k_len, causal=causal,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_forward_bias(rng):
    B, H, T, D = 2, 2, 256, 32
    q, k, v = _rand_qkv(rng, B, H, T, T, D)
    bias = jnp.asarray(rng.standard_normal((H, T, T)), dtype=jnp.float32)
    k_len = jnp.asarray([T, T - 50], dtype=jnp.int32)
    ref = mha_reference(q, k, v, bias=bias, k_len=k_len)
    out = flash_attention(q, k, v, bias=bias, k_len=k_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grad(rng, causal):
    B, H, T, D = 2, 2, 128, 16
    q, k, v = _rand_qkv(rng, B, H, T, T, D)
    k_len = jnp.asarray([T, T - 33], dtype=jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, k_len=k_len, causal=causal,
                            interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, k_len=k_len, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_grad_bias(rng):
    B, H, T, D = 2, 2, 128, 16
    q, k, v = _rand_qkv(rng, B, H, T, T, D)
    bias = jnp.asarray(0.1 * rng.standard_normal((H, T, T)),
                       dtype=jnp.float32)
    k_len = jnp.asarray([T, T - 20], dtype=jnp.int32)

    def loss_flash(q, k, v, bias):
        o = flash_attention(q, k, v, bias=bias, k_len=k_len, interpret=True)
        return jnp.sum(o**2)

    def loss_ref(q, k, v, bias):
        o = mha_reference(q, k, v, bias=bias, k_len=k_len)
        return jnp.sum(o**2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_cpu_fallback(rng):
    """Without interpret/force on CPU the wrapper uses the dense path."""
    B, H, T, D = 1, 2, 64, 16
    q, k, v = _rand_qkv(rng, B, H, T, T, D)
    out = flash_attention(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
