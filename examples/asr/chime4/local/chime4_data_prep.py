#!/usr/bin/env python
"""CHiME-4 data preparation (counterpart of the reference's kaldi-style
local/*_chime4_data_prep.sh scripts, reimplemented in python).

Expected corpus layout (official CHiME-4 release):
  $chime4/data/audio/16kHz/isolated_1ch_track/{tr05,dt05,et05}_*_{real,simu}/*.wav
  $chime4/data/audio/16kHz/isolated/...                  (6ch wavs *.CH[1-6].wav)
  $chime4/data/transcriptions/{tr05,dt05,et05}_{real,simu}.trn_all
    (lines: "<utt-id> <word transcription>")

Outputs per set: wav.scp, text, utt2dur. With --track 6ch the wav.scp
holds "sox -M ch1 .. ch6 -t wav - |" pipes (channel 2 — the backward
microphone — is excluded, as is conventional for CHiME-4 beamforming)."""

import argparse
import glob
import os
import re
import wave


def wav_duration(path: str) -> float:
    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def load_transcriptions(trans_dir: str):
    text = {}
    for trn in glob.glob(os.path.join(trans_dir, "*.trn_all")) + \
            glob.glob(os.path.join(trans_dir, "*.trn")):
        with open(trn, "r", encoding="utf-8", errors="replace") as fd:
            for line in fd:
                tokens = line.split()
                if len(tokens) >= 2:
                    text[tokens[0].upper()] = " ".join(tokens[1:]).upper()
    return text


def write_set(out_dir, utts, text):
    os.makedirs(out_dir, exist_ok=True)
    missing = 0
    with open(f"{out_dir}/wav.scp", "w") as wscp, \
            open(f"{out_dir}/text", "w") as txt, \
            open(f"{out_dir}/utt2dur", "w") as dur:
        for key in sorted(utts):
            value, seconds = utts[key]
            trans_key = key.split(".")[0].upper()
            if trans_key not in text:
                missing += 1
                continue
            wscp.write(f"{key} {value}\n")
            txt.write(f"{key} {text[trans_key]}\n")
            dur.write(f"{key} {seconds:.2f}\n")
    if missing:
        print(f"{out_dir}: skipped {missing} utts without transcription")


def prep_1ch(audio_root, sets, text, out_root):
    for name, patterns in sets.items():
        utts = {}
        for pat in patterns:
            for wav in glob.glob(f"{audio_root}/{pat}/*.wav"):
                key = os.path.splitext(os.path.basename(wav))[0]
                utts[key] = (wav, wav_duration(wav))
        write_set(f"{out_root}/{name}", utts, text)


def prep_6ch(audio_root, sets, text, out_root):
    # channels 1,3,4,5,6 (CH2 faces backwards)
    channels = [1, 3, 4, 5, 6]
    for name, patterns in sets.items():
        utts = {}
        for pat in patterns:
            for ch1 in glob.glob(f"{audio_root}/{pat}/*.CH1.wav"):
                base = re.sub(r"\.CH1\.wav$", "", ch1)
                chans = [f"{base}.CH{c}.wav" for c in channels]
                if not all(os.path.exists(c) for c in chans):
                    continue
                key = os.path.basename(base)
                pipe = "sox -M " + " ".join(chans) + " -t wav - |"
                utts[key] = (pipe, wav_duration(ch1))
        write_set(f"{out_root}/{name}_6ch", utts, text)


def main():
    parser = argparse.ArgumentParser(
        description="Prepare CHiME-4 wav.scp/text/utt2dur",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("chime4_dir", help="Root of the CHiME-4 corpus")
    parser.add_argument("out_dir", help="Output data directory")
    parser.add_argument("--track", default="1ch", choices=["1ch", "6ch"])
    args = parser.parse_args()

    text = load_transcriptions(
        os.path.join(args.chime4_dir, "data", "transcriptions"))
    if not text:
        raise SystemExit("No transcriptions found under data/transcriptions")
    sets = {
        "train": ["tr05_*_real", "tr05_*_simu"],
        "dev": ["dt05_*_real", "dt05_*_simu"],
        "et05_real": ["et05_*_real"],
        "et05_simu": ["et05_*_simu"],
    }
    audio16k = os.path.join(args.chime4_dir, "data", "audio", "16kHz")
    if args.track == "1ch":
        prep_1ch(os.path.join(audio16k, "isolated_1ch_track"), sets, text,
                 args.out_dir)
    else:
        prep_6ch(os.path.join(audio16k, "isolated"), sets, text,
                 args.out_dir)


if __name__ == "__main__":
    main()
