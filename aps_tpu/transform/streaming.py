#!/usr/bin/env python
"""Streaming (frame-by-frame) STFT/iSTFT with explicit carried state.

Parity surface: /root/reference/aps/transform/streaming.py
(StreamingSTFT:13, StreamingiSTFT:65; mirrored natively in
csrc/utils/stft.h). The torch version caches OLA state in module buffers;
here `step` is pure: (state, frame) -> (state, out), so it can live inside
lax.scan and matches the offline transform bit-for-bit (tested in
tests/test_streaming.py)."""

import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from aps_tpu.const import EPSILON
from aps_tpu.transform.utils import _dft_matrices, _idft_matrices, _stft_geometry, make_window


class StreamingSTFT(object):
    """Frame-at-a-time analysis."""

    def __init__(self,
                 frame_len: int,
                 frame_hop: int,
                 window: str = "sqrthann",
                 round_pow_of_two: bool = True,
                 normalized: bool = False,
                 mode: str = "librosa") -> None:
        self.frame_len, self.frame_hop = frame_len, frame_hop
        self.fft_size, self.win_length = _stft_geometry(
            frame_len, round_pow_of_two, mode)
        self.w = jnp.asarray(make_window(window, frame_len,
                                         round_pow_of_two, mode))
        self.normalized = normalized
        self.num_bins = self.fft_size // 2 + 1

    def step(self, frame: jnp.ndarray, return_polar: bool = False,
             eps: float = EPSILON) -> jnp.ndarray:
        """frame: N x (C) x win_length -> N x (C) x F x 2."""
        dc, ds = _dft_matrices(self.fft_size, self.win_length)
        buf = frame * self.w
        real = jnp.matmul(buf, dc, precision="highest")
        imag = jnp.matmul(buf, ds, precision="highest")
        if self.normalized:
            real = real / math.sqrt(self.fft_size)
            imag = imag / math.sqrt(self.fft_size)
        out = jnp.stack([real, imag], -1)
        if return_polar:
            mag = jnp.sqrt(jnp.sum(out**2, -1) + eps)
            pha = jnp.arctan2(out[..., 1], out[..., 0])
            out = jnp.stack([mag, pha], -1)
        return out

    def forward(self, wav: jnp.ndarray, return_polar: bool = False,
                eps: float = EPSILON) -> jnp.ndarray:
        """wav: N x (C) x S -> N x (C) x F x T x 2 (frame loop)."""
        frames = []
        S = wav.shape[-1]
        for t in range(0, S - self.win_length + 1, self.frame_hop):
            frames.append(
                self.step(wav[..., t:t + self.win_length],
                          return_polar=return_polar, eps=eps))
        return jnp.stack(frames, -2)


class IstftState(NamedTuple):
    wav_cache: jnp.ndarray  # N x (win - hop)
    win_cache: jnp.ndarray  # (win - hop,)


class StreamingiSTFT(object):
    """Frame-at-a-time synthesis with overlap-add cache."""

    def __init__(self,
                 frame_len: int,
                 frame_hop: int,
                 window: str = "sqrthann",
                 round_pow_of_two: bool = True,
                 normalized: bool = False,
                 mode: str = "librosa") -> None:
        self.frame_len, self.frame_hop = frame_len, frame_hop
        self.fft_size, self.win_length = _stft_geometry(
            frame_len, round_pow_of_two, mode)
        self.w = jnp.asarray(make_window(window, frame_len,
                                         round_pow_of_two, mode))
        self.normalized = normalized

    def init_state(self, batch: int) -> IstftState:
        overlap = self.win_length - self.frame_hop
        return IstftState(jnp.zeros((batch, overlap)), jnp.zeros((overlap,)))

    def step(self, state: IstftState, frame: jnp.ndarray,
             return_polar: bool = False,
             eps: float = EPSILON) -> Tuple[IstftState, jnp.ndarray]:
        """frame: N x F x 2 -> (state, out N x frame_hop)."""
        if return_polar:
            real = frame[..., 0] * jnp.cos(frame[..., 1])
            imag = frame[..., 0] * jnp.sin(frame[..., 1])
        else:
            real, imag = frame[..., 0], frame[..., 1]
        icos, isin = _idft_matrices(self.fft_size, self.win_length)
        wav = jnp.matmul(real, icos, precision="highest") + \
            jnp.matmul(imag, isin, precision="highest")
        if self.normalized:
            wav = wav * math.sqrt(self.fft_size)
        wav = wav * self.w
        window = self.w**2
        overlap = self.win_length - self.frame_hop
        wav = wav.at[:, :overlap].add(state.wav_cache)
        window = window.at[:overlap].add(state.win_cache)
        new_state = IstftState(wav[:, self.frame_hop:],
                               window[self.frame_hop:])
        out = wav[:, :self.frame_hop] / (window[:self.frame_hop] + eps)
        return new_state, out

    def flush(self, state: IstftState, eps: float = EPSILON) -> jnp.ndarray:
        return state.wav_cache / (state.win_cache + eps)

    def forward(self, transform: jnp.ndarray, return_polar: bool = False,
                eps: float = EPSILON) -> jnp.ndarray:
        """transform: N x F x T x 2 -> wav N x S."""
        state = self.init_state(transform.shape[0])
        outs = []
        for t in range(transform.shape[-2]):
            state, out = self.step(state, transform[..., t, :],
                                   return_polar=return_polar, eps=eps)
            outs.append(out)
        outs.append(self.flush(state, eps=eps))
        return jnp.concatenate(outs, -1)
