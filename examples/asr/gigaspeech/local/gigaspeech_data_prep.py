#!/usr/bin/env python
"""GigaSpeech data preparation from the official GigaSpeech.json metadata:
emits wav.scp (ffmpeg/sox segment pipes over the opus/wav sources), text
and utt2dur for a chosen training subset + dev/test.

Usage: gigaspeech_data_prep.py <gigaspeech-root> <out-dir> --subset XL"""

import argparse
import json
import os

GARBAGE = {"<COMMA>", "<PERIOD>", "<QUESTIONMARK>", "<EXCLAMATIONPOINT>",
           "<SIL>", "<MUSIC>", "<NOISE>", "<OTHER>"}


def norm_text(text: str) -> str:
    words = [w for w in text.split() if w.upper() not in GARBAGE]
    return " ".join(words).upper()


def main():
    parser = argparse.ArgumentParser(
        description="Prepare GigaSpeech wav.scp/text/utt2dur",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("root", help="GigaSpeech corpus root "
                        "(holds GigaSpeech.json + audio/)")
    parser.add_argument("out_dir")
    parser.add_argument("--subset", default="XL",
                        choices=["XS", "S", "M", "L", "XL"],
                        help="training subset tag ({XS..XL})")
    args = parser.parse_args()

    with open(os.path.join(args.root, "GigaSpeech.json")) as fd:
        meta = json.load(fd)

    subset_tag = "{%s}" % args.subset
    sets = {f"train_{args.subset.lower()}": [], "dev": [], "test": []}
    for audio in meta["audios"]:
        path = os.path.join(args.root, audio["path"])
        for seg in audio["segments"]:
            subsets = seg.get("subsets", [])
            if "{DEV}" in subsets:
                name = "dev"
            elif "{TEST}" in subsets:
                name = "test"
            elif subset_tag in subsets:
                name = f"train_{args.subset.lower()}"
            else:
                continue
            text = norm_text(seg["text_tn"])
            if not text:
                continue
            beg, end = seg["begin_time"], seg["end_time"]
            pipe = (f"ffmpeg -loglevel error -i {path} -ss {beg:.2f} "
                    f"-to {end:.2f} -ar 16000 -ac 1 -f wav - |")
            sets[name].append((seg["sid"], pipe, text, end - beg))

    for name, utts in sets.items():
        out = os.path.join(args.out_dir, name)
        os.makedirs(out, exist_ok=True)
        with open(f"{out}/wav.scp", "w") as wscp, \
                open(f"{out}/text", "w") as txt, \
                open(f"{out}/utt2dur", "w") as dur:
            for sid, pipe, text, secs in sorted(utts):
                wscp.write(f"{sid} {pipe}\n")
                txt.write(f"{sid} {text}\n")
                dur.write(f"{sid} {secs:.2f}\n")
        print(f"{name}: {len(utts)} segments")


if __name__ == "__main__":
    main()
