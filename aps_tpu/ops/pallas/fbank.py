#!/usr/bin/env python
"""Fused log-(mel-)fbank Pallas TPU kernel.

Replaces the layered Spectrogram -> Magnitude -> Transpose -> Power -> Mel
-> Log chain of aps_tpu/transform/asr.py (reference: the same stack in
aps/transform/asr.py) with ONE kernel: hop-sized waveform rows stream
HBM -> VMEM once, the real DFT and the mel projection run back-to-back on
the MXU and only the (T, num_mels) log-mel features ever return to HBM.
The layered XLA path materializes the (T, win_length) frame matrix in HBM
(~10x the feature bytes); avoiding that round trip is the point.

Frames are never assembled (Mosaic dislikes unaligned lane concatenation):
the windowed DFT matmul distributes over the hop-sized pieces of a frame,
    re[t] = sum_j (w_j * f_j[t]) @ Dc[j*hop : ...],
where f_j[t] = rows[t + j], so each piece is a static sublane slice of the
row block plus a (BT x hop) @ (hop x F) matmul. Pre-emphasis is applied
globally on host (f[n] - p f[n-1]); the per-frame head sample (which the
layered path scales by (1-p) instead) is patched in-kernel from the raw
rows.

No gradients flow through this op (the transform falls back to the layered
path when the mel matrix is trainable)."""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fbank_kernel(pe0_ref, pe1_ref, raw_ref, win_ref, dc_ref, ds_ref,
                  mel_ref, o_ref, *, block_t, hop, win_length,
                  pre_emphasis, use_power, mag_eps, log_lower_bound,
                  log_eps):
    k_full = win_length // hop
    rem = win_length % hop
    rows = jnp.concatenate([pe0_ref[0], pe1_ref[0]], axis=0)  # 2BT x hop
    widths = [hop] * k_full + ([rem] if rem else [])
    re = None
    im = None
    for j, width in enumerate(widths):
        part = rows[j:j + block_t]
        if j == 0 and pre_emphasis > 0:
            # the layered path scales each frame's first sample by (1-p)
            # instead of subtracting the (cross-frame) previous sample
            col = jax.lax.broadcasted_iota(jnp.int32, (block_t, hop), 1)
            part = jnp.where(col == 0, raw_ref[0] * (1 - pre_emphasis),
                             part)
        if width != hop:
            part = part[:, :width]
        part = part * win_ref[j, :width][None, :]
        off = j * hop
        r = jnp.dot(part, dc_ref[off:off + width],
                    preferred_element_type=jnp.float32)
        i = jnp.dot(part, ds_ref[off:off + width],
                    preferred_element_type=jnp.float32)
        re = r if re is None else re + r
        im = i if im is None else im + i
    power = re * re + im * im
    feat = power if use_power else jnp.sqrt(power + mag_eps)
    out = jnp.dot(feat, mel_ref[...], preferred_element_type=jnp.float32)
    if log_lower_bound > 0:
        out = jnp.log(log_lower_bound + out)
    else:
        out = jnp.log(jnp.maximum(out, log_eps))
    o_ref[0] = out.astype(o_ref.dtype)


def fused_logmel(wav: jnp.ndarray,
                 window: np.ndarray,
                 fft_size: int,
                 frame_hop: int,
                 mel: Optional[np.ndarray] = None,
                 pre_emphasis: float = 0.97,
                 normalized: bool = False,
                 use_power: bool = False,
                 mag_eps: float = 0.0,
                 log_lower_bound: float = 0.0,
                 log_eps: float = 1e-8,
                 block_t: int = 128,
                 interpret: bool = False,
                 force: bool = False) -> jnp.ndarray:
    """wav: N x S -> log-mel N x T x M (log-spectrogram if mel is None,
    with M = fft_size//2 + 1). window: win_length coefficients (kaldi:
    frame_len samples; librosa: fft_size samples, center-padded window);
    mel: F x M filterbank."""
    if not (force or interpret) and jax.default_backend() not in ("tpu",):
        return _reference(wav, window, fft_size, frame_hop, mel,
                          pre_emphasis, normalized, use_power, mag_eps,
                          log_lower_bound, log_eps)
    N, S = wav.shape
    W = int(window.shape[0])
    hop = frame_hop
    T = (S - W) // hop + 1
    nT = -(-T // block_t)
    k_full = W // hop
    rem = W % hop
    k_all = k_full + (1 if rem else 0)
    F = fft_size // 2 + 1
    # hop-sized row layout; block i consumes rows [i*BT, i*BT + BT + k_all]
    rows_total = (nT + 1) * block_t
    pad = rows_total * hop - S
    raw_rows = jnp.pad(wav, ((0, 0), (0, pad))).reshape(N, rows_total, hop)
    if pre_emphasis > 0:
        wav_pe = jnp.concatenate(
            [wav[:, :1] * (1 - pre_emphasis),
             wav[:, 1:] - pre_emphasis * wav[:, :-1]], axis=-1)
    else:
        wav_pe = wav
    pe_rows = jnp.pad(wav_pe, ((0, 0), (0, pad))).reshape(
        N, rows_total, hop)

    win = np.zeros((k_all, hop), dtype=np.float32)
    flat = np.asarray(window, dtype=np.float32)
    if normalized:
        flat = flat / np.sqrt(fft_size)
    for j in range(k_all):
        width = hop if j < k_full else rem
        win[j, :width] = flat[j * hop:j * hop + width]
    n = np.arange(W)
    k = np.arange(F)
    ang = -2.0 * np.pi * np.outer(n, k) / fft_size
    dc = jnp.asarray(np.cos(ang), dtype=jnp.float32)
    ds = jnp.asarray(np.sin(ang), dtype=jnp.float32)
    if mel is None:
        mel_mat = jnp.eye(F, dtype=jnp.float32)
    else:
        mel_mat = jnp.asarray(mel, dtype=jnp.float32)
    M = mel_mat.shape[1]

    kernel = functools.partial(_fbank_kernel,
                               block_t=block_t,
                               hop=hop,
                               win_length=W,
                               pre_emphasis=pre_emphasis,
                               use_power=use_power,
                               mag_eps=mag_eps,
                               log_lower_bound=log_lower_bound,
                               log_eps=log_eps)
    out = pl.pallas_call(
        kernel,
        grid=(N, nT),
        in_specs=[
            pl.BlockSpec((1, block_t, hop), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_t, hop), lambda b, i: (b, i + 1, 0)),
            pl.BlockSpec((1, block_t, hop), lambda b, i: (b, i, 0)),
            pl.BlockSpec((k_all, hop), lambda b, i: (0, 0)),
            pl.BlockSpec((W, F), lambda b, i: (0, 0)),
            pl.BlockSpec((W, F), lambda b, i: (0, 0)),
            pl.BlockSpec((F, M), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_t, M), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, nT * block_t, M), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * T * W * F + 2 * N * T * F * M,
            bytes_accessed=4 * (2 * N * S + N * T * M),
            transcendentals=N * T * M),
    )(pe_rows, pe_rows, raw_rows, jnp.asarray(win), dc, ds, mel_mat)
    return out[:, :T]


def _reference(wav, window, fft_size, frame_hop, mel, pre_emphasis,
               normalized, use_power, mag_eps, log_lower_bound, log_eps):
    """Plain-jnp fallback with identical semantics (non-TPU backends)."""
    W = int(window.shape[0])
    S = wav.shape[-1]
    T = (S - W) // frame_hop + 1
    idx = jnp.arange(T)[:, None] * frame_hop + jnp.arange(W)[None, :]
    frames = wav[:, idx]
    if pre_emphasis > 0:
        head = frames[..., :1] * (1 - pre_emphasis)
        rest = frames[..., 1:] - pre_emphasis * frames[..., :-1]
        frames = jnp.concatenate([head, rest], axis=-1)
    win = jnp.asarray(window, dtype=jnp.float32)
    if normalized:
        win = win / np.sqrt(fft_size)
    frames = frames * win
    n = np.arange(W)
    k = np.arange(fft_size // 2 + 1)
    ang = -2.0 * np.pi * np.outer(n, k) / fft_size
    re = frames @ jnp.asarray(np.cos(ang), dtype=jnp.float32)
    im = frames @ jnp.asarray(np.sin(ang), dtype=jnp.float32)
    power = re * re + im * im
    feat = power if use_power else jnp.sqrt(power + mag_eps)
    if mel is not None:
        feat = feat @ jnp.asarray(mel, dtype=jnp.float32)
    if log_lower_bound > 0:
        return jnp.log(log_lower_bound + feat)
    return jnp.log(jnp.maximum(feat, log_eps))
