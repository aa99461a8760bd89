#!/usr/bin/env python
"""Host-side audio simulation: speaker mixing, RIR convolution, SNR scaling.

Parity surface: /root/reference/aps/loader/simu.py (coeff_snr:17,
add_speaker:32, add_point_noise:71, run_simu:141, make_argparse:300).
Pure numpy/scipy — this runs in dataloader workers, feeding the TPU."""

import argparse
from typing import List, Optional

import numpy as np

from aps_tpu.const import EPSILON
from aps_tpu.io.audio import add_room_response, read_audio
from aps_tpu.opts import StrToBoolAction


def coeff_snr(sig_pow: float, ref_pow: float, snr: float) -> float:
    """Scale for `mix = Sa + alpha*Sb` such that
    SNR = 10*log10[Pa/(Pb*alpha^2)]."""
    if sig_pow == 0:
        return 0
    return (ref_pow / (sig_pow * 10**(snr / 10) + EPSILON))**0.5


def add_speaker(mix_nsamps: int,
                src_spk: List[np.ndarray],
                src_begin: List[int],
                sdr: Optional[List[float]],
                src_rir: Optional[List[np.ndarray]] = None,
                channel: int = -1,
                sr: int = 16000) -> List[np.ndarray]:
    """Reverberate + place + SDR-scale each speaker into its own buffer
    (first speaker is the 0 dB reference). Returns list of N x S images."""
    spk_image, spk_power = [], []
    for i, spk in enumerate(src_spk):
        if src_rir is None:
            src = spk[None, ...] if spk.ndim == 1 else spk
            spk_image.append(src)
            spk_power.append(np.mean(src[0]**2))
        else:
            rir = src_rir[i]
            if rir.ndim == 1:
                rir = rir[None, ...]
            if channel >= 0 and rir.ndim == 2:
                rir = rir[channel:channel + 1]
            revb, _, p = add_room_response(spk, rir, sr=sr)
            spk_image.append(revb)
            spk_power.append(p)
    N = spk_image[0].shape[0]
    mix = [np.zeros([N, mix_nsamps], dtype=np.float32) for _ in src_spk]
    ref_power = spk_power[0]
    for i, image in enumerate(spk_image):
        dur = image.shape[-1]
        beg = src_begin[i]
        coeff = 1 if i == 0 else coeff_snr(spk_power[i], ref_power, sdr[i])
        mix[i][..., beg:beg + dur] += coeff * image
    return mix


def add_point_noise(mix_nsamps: int,
                    ref_power: float,
                    noise: List[np.ndarray],
                    noise_begin: List[int],
                    snr: List[float],
                    noise_rir: Optional[List[np.ndarray]] = None,
                    channel: int = -1,
                    repeat: bool = False,
                    sr: int = 16000) -> np.ndarray:
    """Place point-source noises (optionally reverberated/looped) at the
    requested SNRs vs ref_power. Returns the N x S noise mixture."""
    image, image_power, image_dur = [], [], []
    for i, src in enumerate(noise):
        beg = noise_begin[i]
        if not repeat:
            dur = min(src.shape[-1], mix_nsamps - beg)
        else:
            dur = mix_nsamps - beg
            if src.shape[-1] < dur:
                src = np.pad(src, (0, dur - src.shape[-1]), mode="wrap")
        if noise_rir is None:
            img = src[None, ...] if src.ndim == 1 else src
            image.append(img)
            image_power.append(np.mean(img[0, :dur]**2) if dur > 0 else 0)
        else:
            rir = noise_rir[i]
            if rir.ndim == 1:
                rir = rir[None, ...]
            if channel >= 0 and rir.ndim == 2:
                rir = rir[channel:channel + 1]
            revb, _, p = add_room_response(src[:dur], rir, sr=sr)
            image.append(revb)
            image_power.append(p)
        image_dur.append(dur)
    N = image[0].shape[0]
    mix = np.zeros([N, mix_nsamps], dtype=np.float32)
    for i, img in enumerate(image):
        beg, dur = noise_begin[i], image_dur[i]
        coeff = coeff_snr(image_power[i], ref_power, snr[i])
        mix[..., beg:beg + dur] += coeff * img[..., :dur]
    return mix


def load_audio(src_args: str, beg=None, end=None, sr: int = 16000):
    if not src_args:
        return None
    src_path = src_args.split(",")
    beg_int = [int(v) for v in beg.split(",")] if beg else [None] * len(
        src_path)
    end_int = [int(v) for v in end.split(",")] if end else [None] * len(
        src_path)
    return [
        read_audio(s, sr=sr, beg=b or 0, end=e)
        for s, b, e in zip(src_path, beg_int, end_int)
    ]


def run_simu(args):
    """Run one simulation from command-line style options; returns
    (mix S|CxS, [spk_ref S, ...], noise S|None)."""

    def arg_float(s):
        return [float(v) for v in s.split(",")] if s else None

    src_spk = load_audio(args.src_spk, sr=args.sr)
    src_rir = load_audio(args.src_rir, sr=args.sr)
    if src_rir and len(src_rir) != len(src_spk):
        raise RuntimeError("--src-rir count mismatches --src-spk")
    sdr = arg_float(args.src_sdr)
    if len(src_spk) > 1 and not sdr:
        raise RuntimeError("--src-sdr needed for multiple --src-spk")
    if sdr:
        if len(src_spk) - 1 != len(sdr):
            raise RuntimeError("--src-sdr count must be #speakers - 1")
        sdr = [0] + sdr
    src_begin = arg_float(args.src_begin)
    src_begin = [int(v) for v in src_begin] if src_begin else [0] * len(
        src_spk)
    mix_nsamps = max(b + s.shape[-1] for b, s in zip(src_begin, src_spk))

    point_noise_rir = load_audio(args.point_noise_rir, sr=args.sr)
    point_noise, point_snr, point_begin = None, None, None
    if args.point_noise:
        ends = [
            str(int(v) + mix_nsamps)
            for v in args.point_noise_offset.split(",")
        ] if args.point_noise_offset else None
        point_noise = load_audio(args.point_noise,
                                 beg=args.point_noise_offset or None,
                                 end=",".join(ends) if ends else None,
                                 sr=args.sr)
        if point_noise_rir and len(point_noise) != len(point_noise_rir):
            raise RuntimeError("--point-noise-rir count mismatch")
        point_snr = arg_float(args.point_noise_snr)
        if not point_snr or len(point_noise) != len(point_snr):
            raise RuntimeError("--point-noise-snr count mismatch")
        point_begin = arg_float(args.point_noise_begin)
        point_begin = [int(v) for v in point_begin] if point_begin else \
            [0] * len(point_noise)

    isotropic_noise = load_audio(
        args.isotropic_noise,
        beg=str(args.isotropic_noise_offset),
        end=str(args.isotropic_noise_offset + mix_nsamps),
        sr=args.sr)
    isotropic_snr = None
    if isotropic_noise:
        isotropic_noise = isotropic_noise[0]
        iso_snr = arg_float(args.isotropic_noise_snr)
        if not iso_snr:
            raise RuntimeError("--isotropic-noise-snr required")
        isotropic_snr = iso_snr[0]

    spk = add_speaker(mix_nsamps, src_spk, src_begin, sdr, src_rir=src_rir,
                      channel=args.dump_channel, sr=args.sr)
    spk_utt = sum(spk)
    mix = spk_utt.copy()
    spk_power = np.mean(spk_utt[0]**2)
    noise = None
    if point_noise:
        noise = add_point_noise(mix_nsamps, spk_power, point_noise,
                                point_begin, point_snr,
                                noise_rir=point_noise_rir,
                                channel=args.dump_channel,
                                repeat=args.point_noise_repeat, sr=args.sr)
        if spk_utt.shape[0] != noise.shape[0]:
            if spk_utt.shape[0] == 1:
                noise = noise[0:1]
            else:
                raise RuntimeError("Channel mismatch speaker vs point noise")
        mix = spk_utt + noise
    if isotropic_noise is not None:
        N = spk_utt.shape[0]
        if N == 1:
            if isotropic_noise.ndim == 1:
                isotropic_noise = isotropic_noise[None, ...]
            elif args.dump_channel >= 0:
                isotropic_noise = isotropic_noise[
                    args.dump_channel:args.dump_channel + 1]
            else:
                raise RuntimeError("1ch mixture vs multi-channel iso noise")
        elif isotropic_noise.shape[0] != N:
            raise RuntimeError("Channel mismatch mixture vs iso noise")
        dur = min(mix_nsamps, isotropic_noise.shape[-1])
        iso_chunk = isotropic_noise[0, :dur]
        coeff = coeff_snr(np.mean(iso_chunk**2), spk_power, isotropic_snr)
        mix[..., :dur] += coeff * iso_chunk
        if noise is None:
            noise = (coeff * iso_chunk)[None, ...]
        else:
            noise[..., :dur] += coeff * iso_chunk

    factor = args.norm_factor / (np.max(np.abs(mix)) + EPSILON)
    mix = mix.squeeze() * factor
    spk = [s[0] * factor for s in spk]
    return mix, spk, None if noise is None else noise[0] * factor


def make_argparse() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Command to do audio data simulation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--src-spk", type=str, required=True,
                        help="Source speakers, e.g., spk1.wav,spk2.wav")
    parser.add_argument("--src-rir", type=str, default="",
                        help="RIRs for each source speaker")
    parser.add_argument("--src-sdr", type=str, default="",
                        help="SDR for each speaker (vs speaker 0)")
    parser.add_argument("--src-begin", type=str, default="",
                        help="Begin samples in the mixture")
    parser.add_argument("--point-noise", type=str, default="",
                        help="Point-source noises")
    parser.add_argument("--point-noise-rir", type=str, default="",
                        help="RIRs of the point-source noises")
    parser.add_argument("--point-noise-snr", type=str, default="",
                        help="SNR of the point-source noises")
    parser.add_argument("--point-noise-begin", type=str, default="",
                        help="Begin samples of the noises in the mixture")
    parser.add_argument("--point-noise-offset", type=str, default="",
                        help="Read noise from this offset position")
    parser.add_argument("--point-noise-repeat", action=StrToBoolAction,
                        default=False, nargs="?", const=True,
                        help="Repeat the point-source noise or not")
    parser.add_argument("--isotropic-noise", type=str, default="",
                        help="Isotropic noise")
    parser.add_argument("--isotropic-noise-snr", type=str, default="",
                        help="SNR of the isotropic noise")
    parser.add_argument("--isotropic-noise-offset", type=int, default=0,
                        help="Read noise from this offset position")
    parser.add_argument("--dump-channel", type=int, default=-1,
                        help="Channel index to dump (-1 = all)")
    parser.add_argument("--norm-factor", type=float, default=0.9,
                        help="Normalization factor of the final output")
    parser.add_argument("--sr", type=int, default=16000,
                        help="Sample rate")
    return parser
