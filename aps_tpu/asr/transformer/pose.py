#!/usr/bin/env python
"""Positional encodings: abs / rel / xl / conv1d.

Parity surface: /root/reference/aps/asr/transformer/pose.py (SinPosEncoding
"xl":28, RelPosEncoding "rel":66, InputSinPosEncoding "abs":93,
Conv1dPosEncoding "conv1d":124). Batch-first outputs (N x T x D)."""

import math

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.libs import Register

PosEncodings = Register("pos_encodings")


def get_xfmr_pose(pose: str, dim: int, **kwargs) -> nn.Module:
    if pose not in PosEncodings:
        raise ValueError(f"Unsupported pose layer: {pose}")
    return PosEncodings[pose](embed_dim=dim, **kwargs)


@PosEncodings.register("xl")
class SinPosEncoding(nn.Module):
    """Sinusoidal encodings of given (possibly negative) positions."""
    embed_dim: int
    dropout: float = 0.0

    def _sin_enc(self, position: jnp.ndarray) -> jnp.ndarray:
        div_term = jnp.exp(-math.log(10000.0) *
                           jnp.arange(0, self.embed_dim, 2.0) /
                           self.embed_dim)
        sequence = position[:, None] * div_term
        sin_enc = jnp.stack([jnp.sin(sequence), jnp.cos(sequence)], axis=-1)
        return sin_enc.reshape(position.shape[0], -1)

    @nn.compact
    def __call__(self, position: jnp.ndarray, training: bool = False):
        """position: T -> T x D"""
        out = self._sin_enc(position)
        return nn.Dropout(self.dropout, deterministic=not training,
                          rng_collection="dropout")(out)


@PosEncodings.register("rel")
class RelPosEncoding(nn.Module):
    """Learnt relative-position embeddings (Shaw-style), clipped radius."""
    embed_dim: int
    dropout: float = 0.0
    lradius: int = 128
    rradius: int = 128

    @nn.compact
    def __call__(self, position: jnp.ndarray, training: bool = False):
        """position: T (relative offsets) -> T x D"""
        position = jnp.clip(position, -self.lradius, self.rradius)
        embed = nn.Embed(self.lradius + self.rradius + 1, self.embed_dim)
        out = embed(position + self.lradius)
        return nn.Dropout(self.dropout, deterministic=not training,
                          rng_collection="dropout")(out)


@PosEncodings.register("abs")
class InputSinPosEncoding(SinPosEncoding):
    """Add sinusoidal encodings to the input: N x T x D -> N x T x D."""
    scaled: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, t: int = 0, training: bool = False):
        # t + arange(T) instead of arange(t, t+T): t may be a traced scalar
        # (incremental decoding inside lax loops)
        pos = t + jnp.arange(inp.shape[1], dtype=jnp.float32)
        sin_enc = self._sin_enc(pos)
        factor = self.embed_dim**0.5 if self.scaled else 1
        out = inp * factor + sin_enc
        return nn.Dropout(self.dropout, deterministic=not training,
                          rng_collection="dropout")(out)


@PosEncodings.register("conv1d")
class Conv1dPosEncoding(nn.Module):
    """Convolutional position encoding: N x T x D -> N x T x D (added)."""
    embed_dim: int
    dropout: float = 0.1
    kernel: int = 33
    groups: int = 16

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        conv = nn.Conv(self.embed_dim, (self.kernel,),
                       feature_group_count=self.groups,
                       padding=[((self.kernel - 1) // 2,
                                 (self.kernel - 1) // 2)],
                       kernel_init=nn.initializers.normal(
                           math.sqrt(4 / (self.kernel * self.embed_dim))))
        pos = conv(inp)
        pos = nn.Dropout(self.dropout, deterministic=not training,
                         rng_collection="dropout")(pos)
        return jax.nn.gelu(pos) + inp
