#!/usr/bin/env python
"""Build mix/spk1/spk2 scp files from a wsj0-2mix style directory tree:

    <root>/{tr,cv,tt}/{mix,s1,s2}/*.wav

Counterpart of the scp preparation in the reference's
examples/sse/wsj0_2mix recipe."""

import argparse
from pathlib import Path


def write_scp(wav_dir: Path, scp: Path):
    wavs = sorted(wav_dir.glob("*.wav"))
    with open(scp, "w") as fd:
        for wav in wavs:
            fd.write(f"{wav.stem} {wav}\n")
    return len(wavs)


def run(args):
    root = Path(args.root)
    out = Path(args.data_dir)
    names = {"mix": "mix", "s1": "spk1", "s2": "spk2"}
    for subset in ("tr", "cv", "tt"):
        if not (root / subset).is_dir():
            print(f"skip {subset}")
            continue
        (out / subset).mkdir(parents=True, exist_ok=True)
        for src, dst in names.items():
            n = write_scp(root / subset / src, out / subset / f"{dst}.scp")
            print(f"{subset}/{dst}.scp: {n} utts")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="prepare wsj0-2mix scps")
    parser.add_argument("root", help="wsj0-2mix wav root (tr/cv/tt)")
    parser.add_argument("data_dir", help="output data dir")
    run(parser.parse_args())
