#!/usr/bin/env python
"""AISHELL-2 data preparation. Corpus layout (LDC-style release):
  $root/iOS/data/wav/*/*.wav + $root/iOS/data/trans.txt   (train)
  $root/AISHELL-DEV-TEST-SET/iOS/{dev,test}/wav/...       (+ trans.txt)
Outputs wav.scp/text/utt2dur per set."""

import argparse
import glob
import os
import wave


def prep(wav_root: str, trans: str, out_dir: str):
    text = {}
    with open(trans, "r", encoding="utf-8") as fd:
        for line in fd:
            tokens = line.split()
            if len(tokens) >= 2:
                text[tokens[0]] = " ".join(tokens[1:])
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with open(f"{out_dir}/wav.scp", "w") as wscp, \
            open(f"{out_dir}/text", "w") as txt, \
            open(f"{out_dir}/utt2dur", "w") as dur:
        for wav in sorted(glob.glob(f"{wav_root}/**/*.wav",
                                    recursive=True)):
            key = os.path.splitext(os.path.basename(wav))[0]
            if key not in text:
                continue
            with wave.open(wav, "rb") as w:
                secs = w.getnframes() / w.getframerate()
            wscp.write(f"{key} {wav}\n")
            txt.write(f"{key} {text[key]}\n")
            dur.write(f"{key} {secs:.2f}\n")
            n += 1
    print(f"{out_dir}: {n} utts")


def main():
    parser = argparse.ArgumentParser(
        description="Prepare AISHELL-2 wav.scp/text/utt2dur")
    parser.add_argument("train_dir", help="e.g. $root/iOS/data")
    parser.add_argument("devtest_dir",
                        help="e.g. $root/AISHELL-DEV-TEST-SET/iOS")
    parser.add_argument("out_dir")
    args = parser.parse_args()
    prep(os.path.join(args.train_dir, "wav"),
         os.path.join(args.train_dir, "trans.txt"),
         os.path.join(args.out_dir, "train"))
    for name in ("dev", "test"):
        root = os.path.join(args.devtest_dir, name)
        prep(os.path.join(root, "wav"), os.path.join(root, "trans.txt"),
             os.path.join(args.out_dir, name))


if __name__ == "__main__":
    main()
