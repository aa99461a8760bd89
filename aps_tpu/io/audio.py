#!/usr/bin/env python
"""Audio IO: wav read/write, kaldi-style wav.scp readers, RIR convolution.

Parity surface: /root/reference/aps/io/audio.py (read_audio:25,
write_audio:57, group_segments:83, add_room_response:106, AudioReader:142,
SegmentAudioReader:249). Backend is our own RIFF codec (aps_tpu/io/wav.py)
instead of soundfile; the wav.scp value grammar is identical: plain paths,
"cmd ... |" pipes and "file.ark:offset" archives."""

import io
import os
import subprocess
import warnings
from collections import defaultdict
from typing import IO, Any, Dict, Optional, Union

import numpy as np
import scipy.signal as ss

from aps_tpu.io.base import BaseReader
from aps_tpu.io.wav import wav_read, wav_read_header, wav_write

__all__ = [
    "read_audio", "write_audio", "group_segments", "add_room_response",
    "AudioReader", "SegmentAudioReader"
]


def read_audio(fname: Union[str, IO[Any]],
               beg: int = 0,
               end: Optional[int] = None,
               norm: bool = True,
               sr: int = 16000) -> np.ndarray:
    """Read audio -> C x N (multi-channel) or N, float32."""
    samps, ret_sr = wav_read(fname, beg=beg, end=end, norm=norm)
    if sr > 0 and sr != ret_sr:
        raise RuntimeError(f"Expect sr={sr} of {fname}, get {ret_sr} instead")
    if samps.ndim != 1:
        samps = np.transpose(samps)
    return samps


def write_audio(fname: Union[str, IO[Any]],
                samps: np.ndarray,
                sr: int = 16000,
                norm: bool = True,
                audio_format: str = "wav") -> None:
    """Write audio; accepts C x S or S (channel-major gets transposed)."""
    if audio_format != "wav":
        raise RuntimeError(f"Unsupported format: {audio_format}")
    samps = np.asarray(samps, dtype=np.float32)
    if samps.ndim != 1 and samps.shape[0] < samps.shape[1]:
        samps = np.squeeze(np.transpose(samps))
    if isinstance(fname, str):
        parent = os.path.dirname(fname)
        if parent and not os.path.exists(parent):
            os.makedirs(parent)
    wav_write(fname, samps, sr=sr, norm=norm)


def group_segments(segment: str, sr: int, wav_scp: str = "") -> Dict:
    """Group a kaldi segments file ("seg utt beg end") by utterance key."""
    seg_reader = BaseReader(
        segment, num_tokens=4,
        value_processor=lambda x: (x[0], float(x[1]), float(x[2])))
    wav_reader = BaseReader(wav_scp, num_tokens=2) if wav_scp else None
    grouped = defaultdict(list)
    for seg_key, (utt_key, beg, end) in seg_reader:
        if wav_reader is not None and utt_key not in wav_reader:
            continue
        grouped[utt_key].append((seg_key, int(sr * beg), int(sr * end)))
    return grouped


def add_room_response(spk: np.ndarray,
                      rir: np.ndarray,
                      early_energy: bool = False,
                      early_revb_duration: float = 0.05,
                      sr: int = 16000):
    """Convolve a close-talk signal with (multi-channel) RIRs.
    spk: S; rir: N x R -> (revb N x S, early_revb or None, power)."""
    if spk.ndim != 1:
        raise RuntimeError(f"Can not convolve rir with {spk.ndim}D signals")
    S = spk.shape[-1]
    revb = ss.convolve(spk[None, ...], rir)[..., :S]
    revb = np.asarray(revb)
    if early_energy:
        rir_ch0 = rir[0]
        rir_peak = np.argmax(rir_ch0)
        beg_idx = max(0, int(rir_peak - 0.001 * sr))
        end_idx = min(rir_ch0.size, int(rir_peak + early_revb_duration * sr))
        early_rir = np.zeros_like(rir_ch0)
        early_rir[beg_idx:end_idx] = rir_ch0[beg_idx:end_idx]
        early_revb = ss.convolve(spk, early_rir)[:S]
        return revb, early_revb, np.mean(early_revb**2)
    return revb, None, np.mean(revb[0]**2)


class AudioReader(BaseReader):
    """Random/sequential reader over a kaldi wav.scp (paths | pipes | ark)."""

    def __init__(self,
                 wav_scp: str,
                 sr: int = 16000,
                 norm: bool = True,
                 channel: int = -1,
                 failed_if_error: bool = True) -> None:
        super(AudioReader, self).__init__(wav_scp, num_tokens=2)
        self.sr = sr
        self.ch = channel
        self.norm = norm
        self.mngr = {}
        self.failed_if_error = failed_if_error

    def _load(self, key: str) -> Optional[np.ndarray]:
        fname = self.index_dict[key]
        samps = None
        if ".ark:" in fname:
            tokens = fname.split(":")
            if len(tokens) != 2:
                raise RuntimeError(f"Value format error: {fname}")
            fname, offset = tokens[0], int(tokens[1])
            if fname not in self.mngr:
                self.mngr[fname] = open(fname, "rb")
            wav_ark = self.mngr[fname]
            wav_ark.seek(offset)
            try:
                samps = read_audio(wav_ark, norm=self.norm, sr=self.sr)
            except RuntimeError:
                warnings.warn(f"Read audio {key} {fname}:{offset} failed ...")
        else:
            if fname[-1] == "|":
                p = subprocess.Popen(fname[:-1],
                                     shell=True,
                                     stdout=subprocess.PIPE,
                                     stderr=subprocess.PIPE)
                stdout, stderr = p.communicate()
                if p.returncode != 0:
                    raise RuntimeError(
                        f"Command \"{fname[:-1]}\" failed:\n"
                        f"{bytes.decode(stderr)}")
                fname = io.BytesIO(stdout)
            try:
                samps = read_audio(fname, norm=self.norm, sr=self.sr)
            except RuntimeError:
                warnings.warn(f"Load audio {key} {fname} failed ...")
        if samps is None:
            if self.failed_if_error:
                raise RuntimeError("Audio IO failed ...")
            return samps
        if self.ch >= 0 and samps.ndim == 2:
            samps = samps[self.ch]
        return samps

    def nsamps(self, key: str) -> int:
        fname = self.index_dict[key]
        # header-only fast path for plain files
        if ".ark:" not in fname and fname[-1] != "|":
            return wav_read_header(fname).num_frames
        return self._load(key).shape[-1]

    def power(self, key: str) -> float:
        data = self._load(key)
        s = data if data.ndim == 1 else data[0]
        return float(np.linalg.norm(s, 2)**2 / data.size)

    def duration(self, key: str) -> float:
        return self.nsamps(key) / self.sr


class SegmentAudioReader(object):
    """Sequential reader over (wav.scp, segments)."""

    def __init__(self,
                 wav_scp: str,
                 segment: str,
                 sr: int = 16000,
                 norm: bool = True,
                 channel: int = -1):
        self.audio_reader = AudioReader(wav_scp, sr=sr, norm=norm,
                                        channel=channel)
        self.segment = group_segments(segment, sr, wav_scp=wav_scp)

    def __len__(self):
        return sum(len(v) for v in self.segment.values())

    def __iter__(self):
        for utt_key in self.segment:
            audio = self.audio_reader[utt_key]
            for seg_key, beg, end in self.segment[utt_key]:
                yield seg_key, audio[..., beg:end]
