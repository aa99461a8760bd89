#!/usr/bin/env python
"""Prepare AISHELL-1 data directories (train/dev/test) with
wav.scp / text / utt2dur, from the extracted openslr-33 layout:

    <corpus>/wav/{train,dev,test}/Sxxxx/*.wav
    <corpus>/transcript/aishell_transcript_v0.8.txt

Counterpart of the reference's examples/asr/aishell_v1/local/
aishell_data_prep.sh, rewritten in python on top of aps_tpu's wav reader."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[4]))

from aps_tpu.io.wav import wav_read_header  # noqa: E402


def load_transcript(path):
    table = {}
    with open(path, encoding="utf-8") as fd:
        for line in fd:
            toks = line.strip().split()
            if len(toks) >= 2:
                # char-level text, spaces between characters
                table[toks[0]] = " ".join("".join(toks[1:]))
    return table


def run(args):
    corpus = Path(args.corpus)
    transcript = load_transcript(corpus / "transcript" /
                                 "aishell_transcript_v0.8.txt")
    for subset in ("train", "dev", "test"):
        wav_dir = corpus / "wav" / subset
        if not wav_dir.is_dir():
            print(f"skip {subset}: {wav_dir} not found", file=sys.stderr)
            continue
        out = Path(args.data_dir) / subset
        out.mkdir(parents=True, exist_ok=True)
        wavs = sorted(wav_dir.rglob("*.wav"))
        n_kept, n_miss = 0, 0
        with open(out / "wav.scp", "w") as wscp, \
                open(out / "text", "w", encoding="utf-8") as wtxt, \
                open(out / "utt2dur", "w") as wdur:
            for wav in wavs:
                uid = wav.stem
                if uid not in transcript:
                    n_miss += 1
                    continue
                info = wav_read_header(str(wav))
                dur = info.num_frames / info.sr
                wscp.write(f"{uid} {wav}\n")
                wtxt.write(f"{uid} {transcript[uid]}\n")
                wdur.write(f"{uid} {dur:.3f}\n")
                n_kept += 1
        print(f"{subset}: {n_kept} utterances "
              f"({n_miss} without transcript dropped)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="prepare aishell-1 data")
    parser.add_argument("corpus", help="extracted data_aishell directory")
    parser.add_argument("data_dir", help="output data directory")
    run(parser.parse_args())
