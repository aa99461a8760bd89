#!/usr/bin/env python
"""Prepare LibriSpeech data directories with wav.scp / text / utt2dur.
Expects the extracted openslr-12 layout:

    <corpus>/<subset>/<spk>/<chapter>/{*.flac, *.trans.txt}

FLAC files are referenced through decode pipes ("flac -dcs file |") that
aps_tpu.io.AudioReader executes on demand, so no offline conversion is
needed (counterpart of the reference's local/data_prep.sh)."""

import argparse
import sys
from pathlib import Path


def run(args):
    corpus = Path(args.corpus)
    for subset in args.subsets.split(","):
        sub_dir = corpus / subset
        if not sub_dir.is_dir():
            print(f"skip {subset}: {sub_dir} not found", file=sys.stderr)
            continue
        out = Path(args.data_dir) / subset.replace("-", "_")
        out.mkdir(parents=True, exist_ok=True)
        n = 0
        with open(out / "wav.scp", "w") as wscp, \
                open(out / "text", "w") as wtxt:
            for trans in sorted(sub_dir.rglob("*.trans.txt")):
                chapter = trans.parent
                with open(trans) as fd:
                    for line in fd:
                        uid, sent = line.strip().split(maxsplit=1)
                        flac = chapter / f"{uid}.flac"
                        if not flac.is_file():
                            continue
                        wscp.write(f"{uid} flac -dcs {flac} |\n")
                        wtxt.write(f"{uid} {sent}\n")
                        n += 1
        print(f"{subset}: {n} utterances "
              f"(run utils/wav_duration.py for utt2dur)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="prepare librispeech data")
    parser.add_argument("corpus", help="extracted LibriSpeech root")
    parser.add_argument("data_dir", help="output data dir")
    parser.add_argument("--subsets",
                        default="train-clean-100,train-clean-360,"
                        "train-other-500,dev-clean,test-clean,test-other")
    run(parser.parse_args())
