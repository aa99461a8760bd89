#!/usr/bin/env python
"""Spatial/spectral feature transform for enhancement & separation.

Parity surface: /root/reference/aps/transform/enh.py (RefChannelTransform:21,
PhaseTransform:52, IpdTransform:79, DfTransform:146, FixedBeamformer:303,
FeatureTransform "enh":387 with encode/decode/ctx/forward API).

TPU design: complex STFT stays packed as N x C x F x T x 2 real tensors at the
transform boundary (matching the reference's egs contract); internal math uses
native complex64. The `ctx(...)` hook returns a lightweight pure-function STFT
context (StftCtx) instead of an nn.Module — tasks close over it inside their
jitted loss."""

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.transform.asr import (FeatureTransform as AsrTransform,
                                   TFTransposeTransform)
from aps_tpu.transform.utils import (fft_size_of, forward_stft, inverse_stft,
                                     num_frames)

MATH_PI = math.pi


@dataclass(frozen=True)
class StftCtx:
    """Pure-function (i)STFT context shared by transforms and tasks."""
    frame_len: int
    frame_hop: int
    window: str = "sqrthann"
    center: bool = False
    round_pow_of_two: bool = True
    normalized: bool = False
    mode: str = "librosa"

    @property
    def num_bins(self) -> int:
        return fft_size_of(self.frame_len, self.round_pow_of_two
                           or self.mode == "kaldi") // 2 + 1

    def forward(self, wav: jnp.ndarray, return_polar: bool = False):
        """N x (C) x S -> N x (C) x F x T x 2"""
        return forward_stft(wav, self.frame_len, self.frame_hop,
                            window=self.window, center=self.center,
                            round_pow_of_two=self.round_pow_of_two,
                            normalized=self.normalized, mode=self.mode,
                            return_polar=return_polar, pre_emphasis=0)

    def inverse(self, transform: jnp.ndarray, return_polar: bool = False):
        """(N) x F x T x 2 -> N x S"""
        return inverse_stft(transform, self.frame_len, self.frame_hop,
                            window=self.window, center=self.center,
                            round_pow_of_two=self.round_pow_of_two,
                            normalized=self.normalized, mode=self.mode,
                            return_polar=return_polar)

    def num_frames(self, wav_len):
        if wav_len is None:
            return None
        return num_frames(wav_len, self.frame_len, self.frame_hop,
                          self.round_pow_of_two, self.mode, self.center)

    # __call__ aliases so StftCtx can drop in where a layer was expected
    __call__ = forward


class RefChannelTransform(nn.Module):
    """Select a reference channel (no-op if single-channel or ref < 0)."""
    ref_channel: int = 0
    input_dim: int = 4

    def exportable(self) -> bool:
        return True

    def __call__(self, inp: jnp.ndarray, training: bool = False):
        if inp.ndim != self.input_dim or self.ref_channel < 0:
            return inp
        return inp[:, self.ref_channel]


class PhaseTransform(nn.Module):
    """[real, imag] packed tensor -> phase."""
    dim: int = -1

    def exportable(self) -> bool:
        return True

    def __call__(self, inp: jnp.ndarray, training: bool = False):
        real = jnp.take(inp, 0, axis=self.dim)
        imag = jnp.take(inp, 1, axis=self.dim)
        return jnp.arctan2(imag, real)


class IpdTransform(nn.Module):
    """Inter-channel phase difference features.

    ipd_index: "1,0;2,0" style channel pairs."""
    ipd_index: str = "1,0"
    cos: bool = True
    sin: bool = False

    def setup(self):
        pair = [tuple(map(int, p.split(","))) for p in self.ipd_index.split(";")]
        self.index_l = [t[0] for t in pair]
        self.index_r = [t[1] for t in pair]
        self.num_pairs = len(pair) * 2 if (self.cos and self.sin) else len(pair)

    def exportable(self) -> bool:
        return True

    def __call__(self, p: jnp.ndarray, training: bool = False):
        """p: N x C x T x F phase -> ipd: N x T x MF"""
        if p.ndim == 3:
            p = p[None]
        N, C, T, _ = p.shape
        assert C != 1
        # N x T x C x F
        p = jnp.swapaxes(p, 1, 2)
        pha_dif = p[..., self.index_l, :] - p[..., self.index_r, :]
        if self.cos:
            ipd = jnp.cos(pha_dif)
            if self.sin:
                ipd = jnp.concatenate([ipd, jnp.sin(pha_dif)], 2)
        else:
            # wrap to (-pi, pi]
            ipd = jnp.where(pha_dif > MATH_PI, pha_dif - MATH_PI * 2, pha_dif)
            ipd = jnp.where(ipd <= -MATH_PI, ipd + MATH_PI * 2, ipd)
        return ipd.reshape(N, T, -1)


class PackedIpdTransform(nn.Module):
    """Angle-free IPD over packed spectra: cos/sin of the inter-channel
    phase difference computed by trig identity —
        cos(tl - tr) = (Rl*Rr + Il*Ir) / (|zl||zr|)
        sin(tl - tr) = (Il*Rr - Rl*Ir) / (|zl||zr|)
    so the cos/sin feature modes never need arctan2, which this TPU
    runtime does not implement (raw-phase mode falls back to the
    angle-based IpdTransform pipeline). Output matches IpdTransform."""
    ipd_index: str = "1,0"
    cos: bool = True
    sin: bool = False
    eps: float = EPSILON

    def setup(self):
        pair = [tuple(map(int, p.split(",")))
                for p in self.ipd_index.split(";")]
        self.index_l = [t[0] for t in pair]
        self.index_r = [t[1] for t in pair]

    def exportable(self) -> bool:
        return True

    def __call__(self, packed: jnp.ndarray, training: bool = False):
        """packed: N x C x F x T x 2 -> ipd: N x T x MF"""
        if packed.ndim == 4:
            packed = packed[None]
        N, C, F, T = packed.shape[:4]
        assert C != 1
        # N x C x T x F
        re = jnp.swapaxes(packed[..., 0], -1, -2)
        im = jnp.swapaxes(packed[..., 1], -1, -2)
        # N x T x C x F
        re, im = jnp.swapaxes(re, 1, 2), jnp.swapaxes(im, 1, 2)
        rl, il = re[..., self.index_l, :], im[..., self.index_l, :]
        rr, ir = re[..., self.index_r, :], im[..., self.index_r, :]
        mag = jnp.sqrt((rl * rl + il * il) * (rr * rr + ir * ir))
        mag = jnp.maximum(mag, self.eps)
        cos_ipd = (rl * rr + il * ir) / mag
        if self.cos:
            ipd = cos_ipd
            if self.sin:
                ipd = jnp.concatenate([ipd, (il * rr - rl * ir) / mag], 2)
            return ipd.reshape(N, T, -1)
        raise ValueError("PackedIpdTransform is cos/sin only; raw phase "
                         "uses the IpdTransform pipeline")


class DfTransform(nn.Module):
    """Directional (angle) features for a known circular array geometry.

    geometric "7@": 7-mic circular array (center + 6 @ radius 4.25cm).
    num_doas == 1: oracle DoA given per utterance; else sample num_doas
    uniform directions."""
    geometric: str = "7@"
    sr: int = 16000
    velocity: int = 340
    num_bins: int = 257
    num_doas: int = 1
    af_index: str = "1,0;2,0;3,0;4,0;5,0;6,0"

    def setup(self):
        if self.geometric not in ["7@"]:
            raise RuntimeError(f"Unsupported array geometric: {self.geometric}")
        pair = [tuple(map(int, p.split(","))) for p in self.af_index.split(";")]
        self.index_l = [t[0] for t in pair]
        self.index_r = [t[1] for t in pair]
        self.omega = jnp.asarray([
            math.pi * self.sr * f / (self.num_bins - 1)
            for f in range(self.num_bins)
        ])[None, :]

    def exportable(self) -> bool:
        return True

    def _oracle_phase_delay(self, doa: jnp.ndarray) -> jnp.ndarray:
        """doa: N -> phi: N x (D) x C x F (time-delay-of-arrival phases)."""
        if self.num_doas != 1:
            N = doa.shape[0]
            doa = jnp.tile(
                jnp.linspace(0, MATH_PI * 2, self.num_doas + 1)[:-1], (N, 1))
        R = 0.0425
        zero = jnp.zeros_like(doa)
        tau = R * jnp.stack([
            zero, -jnp.cos(doa), -jnp.cos(MATH_PI / 3 - doa),
            -jnp.cos(2 * MATH_PI / 3 - doa),
            jnp.cos(doa),
            jnp.cos(MATH_PI / 3 - doa),
            jnp.cos(2 * MATH_PI / 3 - doa)
        ], axis=-1) / self.velocity
        # (N x (D) x 7 x 1) @ (1 x F) => N x (D) x 7 x F
        return tau[..., None] * (-self.omega)

    def _compute_af(self, ipd: jnp.ndarray, doa: jnp.ndarray) -> jnp.ndarray:
        """ipd: N x M x T x F, doa: N -> af: N x (D) x T x F"""
        d = self._oracle_phase_delay(doa)
        if self.num_doas == 1:
            dif = d[:, self.index_l] - d[:, self.index_r]
            af = jnp.cos(ipd - dif[..., None, :])
            return jnp.mean(af, axis=1)
        dif = d[:, :, self.index_l] - d[:, :, self.index_r]
        af = jnp.cos(ipd[:, None] - dif[..., None, :])
        return jnp.mean(af, axis=2)

    def __call__(self, p: jnp.ndarray, doa, training: bool = False):
        """p: N x C x T x F phase, doa: N or [N, ...] ->
        af: N x T x F* or N x D x T x F"""
        if p.ndim == 3:
            p = p[None]
        ipd = p[:, self.index_l] - p[:, self.index_r]
        if isinstance(doa, (list, tuple)):
            if self.num_doas != 1:
                raise RuntimeError("known_doa=False: pass a single doa tensor")
            af = [self._compute_af(ipd, spk_doa) for spk_doa in doa]
            return jnp.concatenate(af, -1)
        return self._compute_af(ipd, doa)


class FixedBeamformer(nn.Module):
    """Bank of fixed complex beamformers, optionally trainable."""
    num_beams: int
    num_channels: int
    num_bins: int
    weight: Optional[str] = None
    requires_grad: bool = False

    def setup(self):
        if self.weight:
            # stored as numpy (2, B, C, F)
            w = np.load(self.weight)
            if w.shape[1] != self.num_beams:
                raise RuntimeError(
                    f"Beam number mismatch: {w.shape[1]} vs {self.num_beams}")
            init = lambda _: jnp.asarray(w, dtype=jnp.float32)[..., None]
        else:
            fan_in = self.num_channels * self.num_bins
            bound = math.sqrt(6.0 / fan_in)

            def init(key):
                return jax.random.uniform(
                    key, (2, self.num_beams, self.num_channels, self.num_bins,
                          1), minval=-bound, maxval=bound)

        if self.requires_grad:
            self.w = self.param("weight", init)
        else:
            self.w = init(jax.random.PRNGKey(0))

    def exportable(self) -> bool:
        return True

    def __call__(self,
                 real: jnp.ndarray,
                 imag: jnp.ndarray,
                 beam: Optional[jnp.ndarray] = None,
                 squeeze: bool = False,
                 trans: bool = False,
                 cplx: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """real/imag: N x C x F x T -> N x (B) x F x T (beamformed, w^H x)."""
        wr, wi = self.w[0], self.w[1]  # B x C x F x 1
        if beam is None:
            br = jnp.sum(real[:, None] * wr, 2) + jnp.sum(imag[:, None] * wi, 2)
            bi = jnp.sum(imag[:, None] * wr, 2) - jnp.sum(real[:, None] * wi, 2)
        else:
            br = jnp.sum(real * wr[beam], 1) + jnp.sum(imag * wi[beam], 1)
            bi = jnp.sum(imag * wr[beam], 1) - jnp.sum(real * wi[beam], 1)
        if squeeze:
            br, bi = jnp.squeeze(br), jnp.squeeze(bi)
        if trans:
            br, bi = jnp.swapaxes(br, -1, -2), jnp.swapaxes(bi, -1, -2)
        return br, bi


@ApsRegisters.transform.register("enh")
class FeatureTransform(nn.Module):
    """Spectral + spatial feature transform for SSE models.

    API (mirrors the reference):
      encode(wav, wav_len) -> (packed N x (C) x F x T x 2, num_frames)
      __call__(packed)     -> features N x T x D (mag pipeline + IPD concat)
      decode([packed,...]) -> [wav, ...]
      ctx(name)            -> StftCtx for task-side loss computation
    """
    feats: str = "spectrogram-log-cmvn"
    frame_len: int = 512
    frame_hop: int = 256
    window: str = "sqrthann"
    round_pow_of_two: bool = True
    stft_normalized: bool = False
    stft_mode: str = "librosa"
    center: bool = False
    ref_channel: int = 0
    use_power: bool = False
    sr: int = 16000
    log_lower_bound: float = 0
    num_mels: int = 80
    mel_matrix: str = ""
    mel_coeff_norm: bool = False
    min_freq: int = 0
    max_freq: Optional[int] = None
    num_ceps: int = 13
    lifter: float = 0
    aug_prob: float = 0
    aug_adaptive_args: Tuple[float, float] = (0, 0)
    aug_mask_zero: bool = True
    aug_time_args: Tuple[int, int] = (40, 1)
    aug_freq_args: Tuple[int, int] = (30, 1)
    norm_mean: bool = True
    norm_var: bool = True
    norm_per_band: bool = True
    gcmvn: str = ""
    subsampling_factor: int = 1
    lctx: int = 1
    rctx: int = 1
    delta_ctx: int = 2
    delta_order: int = 2
    delta_as_channel: bool = False
    requires_grad: bool = False
    ipd_index: str = ""
    cos_ipd: bool = True
    sin_ipd: bool = False
    eps: float = EPSILON

    def setup(self):
        feats_tok = self.feats.split("-") if self.feats else []
        feats_mag = "-".join([t for t in feats_tok if t != "ipd"])
        feats_dim = 0
        if feats_mag:
            self.mag_transform = AsrTransform(
                feats=feats_mag,
                frame_len=self.frame_len,
                frame_hop=self.frame_hop,
                window=self.window,
                round_pow_of_two=self.round_pow_of_two,
                stft_normalized=self.stft_normalized,
                stft_mode=self.stft_mode,
                center=self.center,
                use_power=self.use_power,
                sr=self.sr,
                log_lower_bound=self.log_lower_bound,
                num_mels=self.num_mels,
                mel_matrix=self.mel_matrix,
                mel_coeff_norm=self.mel_coeff_norm,
                min_freq=self.min_freq,
                max_freq=self.max_freq,
                num_ceps=self.num_ceps,
                lifter=self.lifter,
                aug_prob=self.aug_prob,
                aug_adaptive_args=self.aug_adaptive_args,
                aug_mask_zero=self.aug_mask_zero,
                aug_time_args=self.aug_time_args,
                aug_freq_args=self.aug_freq_args,
                norm_mean=self.norm_mean,
                norm_var=self.norm_var,
                norm_per_band=self.norm_per_band,
                gcmvn=self.gcmvn,
                subsampling_factor=self.subsampling_factor,
                lctx=self.lctx,
                rctx=self.rctx,
                delta_ctx=self.delta_ctx,
                delta_order=self.delta_order,
                delta_as_channel=self.delta_as_channel,
                requires_grad=self.requires_grad)
            feats_dim = self.mag_transform.feats_dim
        else:
            self.mag_transform = None
        if "ipd" in feats_tok and self.ipd_index:
            if self.cos_ipd:
                # angle-free trig-identity path (works on TPU backends
                # without arctan2)
                self.ipd_layers = [
                    PackedIpdTransform(ipd_index=self.ipd_index,
                                       cos=self.cos_ipd, sin=self.sin_ipd)
                ]
            else:
                self.ipd_layers = [
                    PhaseTransform(dim=-1),
                    TFTransposeTransform(),
                    IpdTransform(ipd_index=self.ipd_index, cos=False,
                                 sin=False)
                ]
            npair = len(self.ipd_index.split(";"))
            nbin = self.stft_ctx().num_bins
            feats_dim += npair * (2 if self.cos_ipd and self.sin_ipd else 1) * \
                nbin
        else:
            self.ipd_layers = None
        self.feats_dim = feats_dim

    def stft_ctx(self) -> StftCtx:
        return StftCtx(frame_len=self.frame_len,
                       frame_hop=self.frame_hop,
                       window=self.window,
                       center=self.center,
                       round_pow_of_two=self.round_pow_of_two,
                       normalized=self.stft_normalized,
                       mode=self.stft_mode)

    def ctx(self, name: str = "forward_stft") -> StftCtx:
        if name not in ("forward_stft", "inverse_stft"):
            raise ValueError(f"Unknown task context: {name}")
        return self.stft_ctx()

    def dim(self) -> int:
        return self.feats_dim

    def num_frames(self, wav_len):
        return self.stft_ctx().num_frames(wav_len)

    def encode(self, wav_pad: jnp.ndarray, wav_len=None):
        """wav: N x (C) x S -> (packed N x (C) x F x T x 2, num_frames)."""
        packed = self.stft_ctx().forward(wav_pad, return_polar=False)
        return packed, self.num_frames(wav_len)

    def decode(self, packed: List[jnp.ndarray]) -> List[jnp.ndarray]:
        ctx = self.stft_ctx()
        return [ctx.inverse(p, return_polar=False) for p in packed]

    def __call__(self, packed: jnp.ndarray, training: bool = False):
        """packed: N x (C) x F x T x 2 -> feats: N x T x D"""
        feats = []
        if self.mag_transform is not None:
            x = packed
            if x.ndim == 5 and self.ref_channel >= 0:
                x = x[:, self.ref_channel]
            mag, _ = self.mag_transform(x, None, training=training,
                                        skip_stft=True)
            feats.append(mag)
        if self.ipd_layers is not None:
            x = packed
            for layer in self.ipd_layers:
                x = layer(x, training=training)
            feats.append(x)
        return jnp.concatenate(feats, -1)


EnhTransform = FeatureTransform
