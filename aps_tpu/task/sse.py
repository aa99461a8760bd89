#!/usr/bin/env python
"""Speech separation & enhancement tasks.

Parity surface: /root/reference/aps/task/sse.py — same registry names
(sse@sisnr, sse@snr, sse@wa, sse@freq_linear_sa, sse@freq_mel_sa,
sse@time_linear_sa, sse@time_mel_sa, sse@complex_mapping,
sse@complex_masking) and loss semantics; STFT contexts are pure-function
StftCtx objects that trace into the jitted loss."""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.task.base import Task
from aps_tpu.task.objf import (DpclObjfComputer, hybrid_permu_objf,
                               sisnr_objf, snr_objf)
from aps_tpu.transform.enh import StftCtx
from aps_tpu.transform.utils import mel_filter

__all__ = [
    "SisnrTask", "SnrTask", "WaTask", "LinearFreqSaTask", "LinearTimeSaTask",
    "MelFreqSaTask", "MelTimeSaTask", "ComplexMappingTask",
    "ComplexMaskingTask"
]


def _l1(a, b):
    return jnp.abs(a - b)


def _l2(a, b):
    return (a - b)**2


def _parse_weight(weight):
    if weight is None:
        return None
    if isinstance(weight, str):
        return [float(w) for w in weight.split(",")]
    return list(weight)


class SepTask(Task):
    """Base class for separation & enhancement tasks."""
    weight: Optional[str] = None

    def branch_weight(self):
        return _parse_weight(self.weight)

    def objf(self, out, ref):
        raise NotImplementedError

    def transform(self, tensor):
        return tensor


class TimeDomainTask(SepTask):
    """Waveform-level loss task."""
    num_spks: int = 2
    permute: bool = True

    def __call__(self, egs, training: bool = True):
        """egs: {mix: N x (C) x S, ref: N x S or [N x S, ...]}."""
        ref = egs["ref"]
        out = self.nnet(egs["mix"], training=training)
        if not isinstance(out, (list, tuple)):
            out, ref = [out], [ref]
        loss = hybrid_permu_objf(list(out), list(ref), self.objf,
                                 weight=self.branch_weight(),
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        return {"loss": jnp.mean(loss)}


@ApsRegisters.task.register("sse@sisnr")
class SisnrTask(TimeDomainTask):
    """Negative SiSNR objective."""
    zero_mean: bool = True
    non_nagetive: bool = False

    def objf(self, out, ref):
        return -sisnr_objf(out, ref, zero_mean=self.zero_mean,
                           non_nagetive=self.non_nagetive)


@ApsRegisters.task.register("sse@snr")
class SnrTask(TimeDomainTask):
    """Negative SNR objective."""
    snr_max: float = -1
    non_nagetive: bool = False

    def objf(self, out, ref):
        return -snr_objf(out, ref, non_nagetive=self.non_nagetive,
                         snr_max=self.snr_max)


@ApsRegisters.task.register("sse@wa")
class WaTask(TimeDomainTask):
    """Waveform L1/L2 approximation."""
    objf_name: str = "L1"

    def objf(self, out, ref):
        fn = _l1 if self.objf_name == "L1" else _l2
        return jnp.sum(fn(out, ref), -1)


class FreqSaTask(SepTask):
    """Frequency-domain spectral approximation base (mask or mapping)."""
    phase_sensitive: bool = False
    truncated: float = -1
    permute: bool = True
    masking: bool = True
    num_spks: int = 2
    dpcl_weight: float = 0

    def _ctx(self) -> StftCtx:
        return self.nnet.enh_transform.ctx("forward_stft")

    def _ref_mag(self, mix_packed, mix_mag, ref_packed):
        """Packed (real/imag) spectra -> (t)PSA target magnitude.
        cos(ref_pha - mix_pha) comes from the trig identity
        (Rr*Rm + Ir*Im) / (|ref||mix|) — no arctan2 on device (the TPU
        runtime has none)."""
        ref_mag = jnp.sqrt(ref_packed[..., 0]**2 + ref_packed[..., 1]**2 +
                           EPSILON)
        if self.phase_sensitive:
            dot = ref_packed[..., 0] * mix_packed[..., 0] + \
                ref_packed[..., 1] * mix_packed[..., 1]
            cos_dif = dot / jnp.maximum(ref_mag * mix_mag, EPSILON)
            ref_mag = ref_mag * jnp.maximum(cos_dif, 0)
        if self.truncated > 0:
            ref_mag = jnp.minimum(ref_mag, self.truncated * mix_mag)
        return ref_mag

    def __call__(self, egs, training: bool = True):
        if not self.masking and self.truncated > 0:
            raise ValueError("masking = False conflicts with truncated > 0")
        mix, ref = egs["mix"], egs["ref"]
        mask = self.nnet(mix, training=training)
        ctx = self._ctx()
        mix_packed = ctx.forward(mix[:, 0] if mix.ndim == 3 else mix)
        mix_mag = jnp.sqrt(mix_packed[..., 0]**2 + mix_packed[..., 1]**2 +
                           EPSILON)
        if not isinstance(mask, (list, tuple)):
            mask, ref = [mask], [ref]
        ref_in_packed = [ctx.forward(r) for r in ref]
        ref_mag = [self._ref_mag(mix_packed, mix_mag, r)
                   for r in ref_in_packed]
        if self.masking:
            out = [m * mix_mag for m in mask]
        else:
            out = list(mask)
        loss = hybrid_permu_objf(out, ref_mag, self.objf,
                                 transform=self.transform,
                                 weight=self.branch_weight(),
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        mask_loss = jnp.mean(loss)
        enable_dpcl = self.dpcl_weight > 0 and hasattr(self.nnet,
                                                       "dpcl_embed")
        if enable_dpcl and self.num_spks > 1:
            raw_mag = jnp.stack([
                jnp.sqrt(r[..., 0]**2 + r[..., 1]**2 + EPSILON)
                for r in ref_in_packed
            ], -1)
            dpcl_loss = DpclObjfComputer()(self.nnet.dpcl_embed(mix),
                                           raw_mag, mix_mag,
                                           mean=True)
            loss = self.dpcl_weight * dpcl_loss + \
                (1 - self.dpcl_weight) * mask_loss
            return {"loss": loss, "dpcl": dpcl_loss, "mask": mask_loss}
        return {"loss": mask_loss}


@ApsRegisters.task.register("sse@freq_linear_sa")
class LinearFreqSaTask(FreqSaTask):
    """Linear spectral approximation (MSA or tPSA)."""
    objf_name: str = "L2"

    def objf(self, out, ref):
        fn = _l1 if self.objf_name == "L1" else _l2
        # out/ref: N x F x T: mean over T, sum over F
        return jnp.sum(jnp.mean(fn(out, ref), -1), -1)


class _MelMixin:
    """Shared mel projection for SA losses."""

    def mel_mat(self):
        mel = mel_filter(None,
                         num_bins=self.num_bins,
                         sr=self.sr,
                         num_mels=self.num_mels,
                         fmax=self.fmax,
                         norm=self.mel_norm)
        return jnp.asarray(mel) * self.mel_scale

    def mel_transform(self, tensor):
        if self.power_mag:
            tensor = tensor**2
        # N x F x T -> N x M x T
        mel = jnp.einsum("mf,nft->nmt", self.mel_mat(), tensor)
        if self.mel_log:
            mel = jnp.log(1 + mel)
        return mel


@ApsRegisters.task.register("sse@freq_mel_sa")
class MelFreqSaTask(FreqSaTask, _MelMixin):
    """Mel-domain spectral approximation."""
    power_mag: bool = False
    num_bins: int = 257
    num_mels: int = 80
    mel_log: bool = False
    mel_scale: float = 1
    mel_norm: bool = False
    sr: int = 16000
    fmax: int = 8000

    def transform(self, tensor):
        return self.mel_transform(tensor)

    def objf(self, out, ref):
        return jnp.sum(jnp.mean(_l2(out, ref), -1), -1)


class TimeSaTask(SepTask):
    """Time-domain output, spectral-approximation loss."""
    frame_len: int = 512
    frame_hop: int = 256
    center: bool = False
    window: str = "sqrthann"
    round_pow_of_two: bool = True
    stft_normalized: bool = False
    pre_emphasis: float = 0
    permute: bool = True
    num_spks: int = 2

    def _ctx(self) -> StftCtx:
        return StftCtx(frame_len=self.frame_len,
                       frame_hop=self.frame_hop,
                       window=self.window,
                       center=self.center,
                       round_pow_of_two=self.round_pow_of_two,
                       normalized=self.stft_normalized)

    def _stft_mag(self, wav):
        if self.pre_emphasis > 0:
            rest = wav[:, 1:] - self.pre_emphasis * wav[:, :-1]
            wav = jnp.concatenate([wav[:, :1], rest], axis=1)
        packed = self._ctx().forward(wav)
        # magnitude from the packed pair (polar mode needs arctan2 for the
        # phase half, which the TPU runtime lacks — and we'd discard it)
        return jnp.sqrt(packed[..., 0]**2 + packed[..., 1]**2 + EPSILON)

    def __call__(self, egs, training: bool = True):
        mix, ref = egs["mix"], egs["ref"]
        spk = self.nnet(mix, training=training)
        if not isinstance(spk, (list, tuple)):
            spk, ref = [spk], [ref]
        spk_mag = [self._stft_mag(s) for s in spk]
        ref_mag = [self._stft_mag(r) for r in ref]
        loss = hybrid_permu_objf(spk_mag, ref_mag, self.objf,
                                 transform=self.transform,
                                 weight=self.branch_weight(),
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        return {"loss": jnp.mean(loss)}


@ApsRegisters.task.register("sse@time_linear_sa")
class LinearTimeSaTask(TimeSaTask):
    objf_name: str = "L2"

    def objf(self, out, ref):
        fn = _l1 if self.objf_name == "L1" else _l2
        return jnp.sum(jnp.mean(fn(out, ref), -1), -1)


@ApsRegisters.task.register("sse@time_mel_sa")
class MelTimeSaTask(TimeSaTask, _MelMixin):
    power_mag: bool = False
    num_bins: int = 257
    num_mels: int = 80
    mel_log: bool = False
    mel_scale: float = 1
    mel_norm: bool = False
    sr: int = 16000
    fmax: int = 7690

    def transform(self, tensor):
        return self.mel_transform(tensor)

    def objf(self, out, ref):
        return jnp.sum(jnp.mean(_l2(out, ref), -1), -1)


@ApsRegisters.task.register("sse@complex_mapping")
class ComplexMappingTask(SepTask):
    """Complex spectral mapping: L1/L2 on real+imag (+magnitude)."""
    num_spks: int = 2
    permute: bool = True
    objf_name: str = "L1"
    add_magnitude_loss: bool = True

    def _ctx(self) -> StftCtx:
        return self.nnet.enh_transform.ctx("forward_stft")

    def objf(self, out, ref):
        fn = _l1 if self.objf_name == "L1" else _l2
        loss = fn(out[..., 0], ref[..., 0]) + fn(out[..., 1], ref[..., 1])
        if self.add_magnitude_loss:
            out_mag = jnp.sqrt(out[..., 0]**2 + out[..., 1]**2 + EPSILON)
            ref_mag = jnp.sqrt(ref[..., 0]**2 + ref[..., 1]**2 + EPSILON)
            loss = loss + fn(out_mag, ref_mag)
        return jnp.sum(jnp.mean(loss, -1), -1)

    def __call__(self, egs, training: bool = True):
        mix, ref = egs["mix"], egs["ref"]
        out = self.nnet(mix, training=training)
        if not isinstance(out, (list, tuple)):
            out, ref = [out], [ref]
        ctx = self._ctx()
        ref = [ctx.forward(r, return_polar=False) for r in ref]
        loss = hybrid_permu_objf(list(out), ref, self.objf,
                                 weight=self.branch_weight(),
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        return {"loss": jnp.mean(loss)}


@ApsRegisters.task.register("sse@complex_masking")
class ComplexMaskingTask(ComplexMappingTask):
    """Complex-ratio-mask objective (cIRM compression optional)."""
    compress_param: Tuple[float, float, float] = (10, 0.1, -100)
    compress_masks: bool = False
    objf_name: str = "L2"
    add_magnitude_loss: bool = False

    def _compress_mask(self, mix_stft, ref):
        k, c, lower_bound = self.compress_param
        ref_stft = self._ctx().forward(ref, return_polar=False)
        denominator = jnp.sum(mix_stft**2, -1) + EPSILON
        real = (mix_stft[..., 0] * ref_stft[..., 0] +
                mix_stft[..., 1] * ref_stft[..., 1])
        imag = (mix_stft[..., 0] * ref_stft[..., 1] -
                mix_stft[..., 1] * ref_stft[..., 0])
        crm = jnp.stack([real, imag], -1) / denominator[..., None]
        exp = jnp.exp(-c * jnp.maximum(crm, lower_bound))
        return k * (1 - exp) / (1 + exp)

    def _complex_tf_mask(self, mix_stft, mask):
        real = (mix_stft[..., 0] * mask[..., 0] -
                mix_stft[..., 1] * mask[..., 1])
        imag = (mix_stft[..., 0] * mask[..., 1] +
                mix_stft[..., 1] * mask[..., 0])
        return jnp.stack([real, imag], -1)

    def __call__(self, egs, training: bool = True):
        ref = egs["ref"]
        out = self.nnet(egs["mix"], training=training)
        if not isinstance(out, (list, tuple)):
            out, ref = [out], [ref]
        mix = self._ctx().forward(egs["mix"], return_polar=False)
        if self.compress_masks:
            ref = [self._compress_mask(mix, r) for r in ref]
            out = list(out)
        else:
            ref = [self._ctx().forward(r, return_polar=False) for r in ref]
            out = [self._complex_tf_mask(mix, o) for o in out]
        loss = hybrid_permu_objf(out, ref, self.objf,
                                 weight=self.branch_weight(),
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        return {"loss": jnp.mean(loss)}
