#!/usr/bin/env python
"""Dump utt2dur from a wav.scp (parity: reference utils/wav_duration.py)."""
import argparse
import sys
sys.path.insert(0, ".")
from aps_tpu.io import AudioReader  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("wav_scp")
parser.add_argument("utt2dur")
parser.add_argument("--sr", type=int, default=16000)
args = parser.parse_args()
reader = AudioReader(args.wav_scp, sr=args.sr)
with open(args.utt2dur, "w") as fd:
    for key in reader.index_keys:
        fd.write(f"{key} {reader.duration(key):.4f}\n")
