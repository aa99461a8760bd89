#!/usr/bin/env python
"""Merge per-corpus data dirs (each holding wav.scp/text/utt2dur, as
produced by the aishell_v1/aishell_v2-style prep scripts) into one
multi_cn set, prefixing utterance keys with the corpus name to keep them
unique."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(
        description="Merge prepared corpora into data/multi_cn/<set>")
    parser.add_argument("out_dir")
    parser.add_argument("corpora", nargs="+",
                        help="name:path pairs, e.g. aishell:data/aishell_v1/train")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for fname in ("wav.scp", "text", "utt2dur"):
        with open(os.path.join(args.out_dir, fname), "w") as out:
            for spec in args.corpora:
                name, _, path = spec.partition(":")
                src = os.path.join(path, fname)
                if not os.path.exists(src):
                    print(f"skip {src} (missing)")
                    continue
                with open(src, "r", encoding="utf-8") as fd:
                    for line in fd:
                        tokens = line.split(maxsplit=1)
                        if len(tokens) == 2:
                            out.write(f"{name}_{tokens[0]} {tokens[1]}")
    print(f"merged {len(args.corpora)} corpora into {args.out_dir}")


if __name__ == "__main__":
    main()
