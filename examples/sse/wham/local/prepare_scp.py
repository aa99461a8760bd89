#!/usr/bin/env python
"""Build scp files from a WHAM! directory tree:

    <root>/{tr,cv,tt}/{mix_clean,mix_both,mix_single,s1,s2,noise}/*.wav

Counterpart of the scp preparation in the reference's examples/sse/wham
recipe. Every source directory that exists is indexed; the confs pick
mix_clean (clean training) or mix_both (noisy training)."""

import argparse
from pathlib import Path

SOURCES = ("mix_clean", "mix_both", "mix_single", "s1", "s2", "noise")


def write_scp(wav_dir: Path, scp: Path) -> int:
    wavs = sorted(wav_dir.glob("*.wav"))
    with open(scp, "w") as fd:
        for wav in wavs:
            fd.write(f"{wav.stem} {wav}\n")
    return len(wavs)


def run(args):
    root = Path(args.root)
    out = Path(args.data_dir)
    for subset in ("tr", "cv", "tt"):
        if not (root / subset).is_dir():
            print(f"skip {subset}")
            continue
        (out / subset).mkdir(parents=True, exist_ok=True)
        for src in SOURCES:
            if not (root / subset / src).is_dir():
                continue
            n = write_scp(root / subset / src, out / subset / f"{src}.scp")
            print(f"{subset}/{src}.scp: {n} utts")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="prepare WHAM! scps")
    parser.add_argument("root", help="wham wav root, e.g. .../wav16k/max")
    parser.add_argument("data_dir", help="output data dir")
    run(parser.parse_args())
