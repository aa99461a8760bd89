#!/usr/bin/env python
"""Build multi-channel mix scps for unsupervised CHiME-4 enhancement:
every 6ch isolated utterance becomes one "sox -M ..." pipe (CH2, the
backward-facing mic, excluded). No references — the ML task is
unsupervised."""

import argparse
import glob
import os
import re


def main():
    parser = argparse.ArgumentParser(
        description="Prepare CHiME-4 unsupervised mix scps")
    parser.add_argument("chime4_dir", help="Root of the CHiME-4 corpus")
    parser.add_argument("out_dir", help="Output data directory")
    args = parser.parse_args()

    isolated = os.path.join(args.chime4_dir, "data", "audio", "16kHz",
                            "isolated")
    channels = [1, 3, 4, 5, 6]
    sets = {"trn": ["tr05_*_real", "tr05_*_simu"],
            "dev": ["dt05_*_real", "dt05_*_simu"]}
    os.makedirs(args.out_dir, exist_ok=True)
    for name, patterns in sets.items():
        lines = []
        for pat in patterns:
            for ch1 in glob.glob(f"{isolated}/{pat}/*.CH1.wav"):
                base = re.sub(r"\.CH1\.wav$", "", ch1)
                chans = [f"{base}.CH{c}.wav" for c in channels]
                if all(os.path.exists(c) for c in chans):
                    key = os.path.basename(base)
                    lines.append(f"{key} sox -M " + " ".join(chans) +
                                 " -t wav - |")
        with open(f"{args.out_dir}/{name}.scp", "w") as fd:
            fd.write("\n".join(sorted(lines)) + "\n")
        print(f"{name}: {len(lines)} utts")


if __name__ == "__main__":
    main()
