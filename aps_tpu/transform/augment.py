#!/usr/bin/env python
"""Spectral augmentation (SpecAugment) + speed perturbation, vectorized.

Parity surface: /root/reference/aps/transform/augment.py (tf_mask:13,
random_mask:57, perturb_speed:87).

TPU design: the reference draws masks in a per-utterance python loop with
host RNG. Here mask generation is a single vectorized jax.random program
(keys threaded from the trainer), so it traces once and fuses into the
feature pipeline; all shapes stay static.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def random_mask(key: jax.Array,
                batch: int,
                length: int,
                max_steps: int,
                num_masks: int) -> jnp.ndarray:
    """Batch of 0/1 span masks over `length`: N x L, each row has
    `num_masks` random spans of duration U[1, max_steps) zeroed."""
    max_steps = min(max_steps, length)
    kd, kb = jax.random.split(key)
    # durations in [1, max_steps - 1] (empty span when max_steps <= 1)
    if max_steps <= 1:
        return jnp.ones((batch, length))
    dur = jax.random.randint(kd, (batch, num_masks), 1, max_steps)
    free = jnp.maximum(length - dur, 1)
    beg = (jax.random.uniform(kb, (batch, num_masks)) * free).astype(jnp.int32)
    pos = jnp.arange(length)[None, None, :]
    hit = (pos >= beg[..., None]) & (pos < (beg + dur)[..., None])
    # span is skipped (mask all-ones) when it cannot fit, like the reference
    hit = hit & (dur[..., None] < length)
    return 1.0 - jnp.any(hit, axis=1).astype(jnp.float32)


def tf_mask(key: jax.Array,
            batch: int,
            shape: Tuple[int, int],
            pm: float = 0.0,
            ps: float = 0.0,
            max_bands: int = 30,
            max_frame: int = 40,
            num_freq_masks: int = 2,
            num_time_masks: int = 2) -> jnp.ndarray:
    """SpecAugment time+freq masks: N x T x F in {0, 1}."""
    T, F = shape
    max_bands = min(max_bands, F)
    # adaptive variant (SpecAugment on Large Scale Datasets)
    if ps > 0:
        max_frame = min(max_frame, int(T * ps))
    if pm > 0:
        num_time_masks = min(num_time_masks, int(T * pm))
    kf, kt = jax.random.split(key)
    fmask = random_mask(kf, batch, F, max_bands, num_freq_masks)
    tmask = random_mask(kt, batch, T, max_frame, num_time_masks)
    return tmask[:, :, None] * fmask[:, None, :]


def perturb_speed(wav: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Polyphase resampling: N x S -> N x (S//src_sr)*dst_sr.

    weight: dst_sr x src_sr x K filter bank from speed_perturb_filter."""
    dst_sr, src_sr, K = weight.shape
    N, S = wav.shape
    num_blocks = S // src_sr
    if num_blocks == 0:
        raise RuntimeError(f"Input too short for speed perturb: {S}")
    # N x B x src_sr -> N x src_sr x B
    x = wav[:, :num_blocks * src_sr].reshape(N, num_blocks, src_sr)
    x = jnp.swapaxes(x, 1, 2)
    # conv over the block axis: N x dst_sr x B
    y = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(1,),
        padding=[((K - 1) // 2, K - 1 - (K - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    # N x B x dst_sr -> N x B*dst_sr
    y = jnp.swapaxes(y, 1, 2)
    return y.reshape(N, -1)
