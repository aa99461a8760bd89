#!/usr/bin/env python
"""Transformer helpers: relative-position digit shift, causal/chunk masks.

Parity surface: /root/reference/aps/asr/transformer/utils.py (digit_shift:14,
prep_sub_mask:42, prep_context_mask:61, get_activation_fn, get_relative_uv).
Layout is batch-first (N x H x L x S) instead of the reference's
time-first."""

from typing import Tuple

import jax.nn
import jax.numpy as jnp
import numpy as np

from aps_tpu.const import NEG_INF


def digit_shift(term: jnp.ndarray) -> jnp.ndarray:
    """Relative-position trick: ... x L x 2L-1 -> ... x L x L.
    Index [l, s] of the output reads input [l, s - l + L - 1]."""
    *pre, L, X = term.shape
    if L * 2 - 1 != X:
        raise RuntimeError(f"digit_shift expects ... x L x 2L-1, got "
                           f"{term.shape}")
    term_pad = jnp.pad(term, [(0, 0)] * len(pre) + [(0, 0), (1, 0)])
    term_pad = term_pad.reshape(*pre, 2 * L, L)
    term = term_pad[..., 1:, :].reshape(*pre, L, 2 * L - 1)
    return term[..., :L]


def prep_sub_mask(num_frames: int) -> jnp.ndarray:
    """Causal (sub-sequence) additive mask: T x T with -inf above diag."""
    mask = np.triu(np.ones((num_frames, num_frames)), k=1)
    return jnp.asarray(np.where(mask == 1, NEG_INF, 0.0), dtype=jnp.float32)


def prep_context_mask(num_frames: int,
                      chunk_size: int = 1,
                      lctx: int = 0,
                      rctx: int = 0,
                      ninf: float = NEG_INF) -> jnp.ndarray:
    """Chunked-context additive mask (lctx/rctx in chunks, -1 = infinite)."""
    if lctx < 0:
        lctx = num_frames
    if rctx < 0:
        rctx = num_frames
    index = np.arange(num_frames)
    index_floor = index // chunk_size
    right = (index_floor + rctx + 1) * chunk_size
    left = np.maximum((index_floor - lctx) * chunk_size, 0)
    seqs = np.tile(index[None, :], (num_frames, 1))
    ctx_mask = (seqs >= right[:, None]) | (seqs < left[:, None])
    return jnp.asarray(np.where(ctx_mask, ninf, 0.0), dtype=jnp.float32)


def get_activation_fn(activation: str):
    if activation == "relu":
        return jax.nn.relu
    if activation == "gelu":
        return jax.nn.gelu
    if activation == "swish":
        return jax.nn.silu
    raise RuntimeError(f"activation should be relu/gelu/swish, "
                       f"not {activation}")
