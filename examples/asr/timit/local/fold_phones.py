#!/usr/bin/env python
"""Fold 48-phone transcriptions/decodes to the 39-phone scoring set."""

import sys


def main():
    if len(sys.argv) != 3:
        raise SystemExit(f"usage: {sys.argv[0]} <text> <phones.map>")
    fold = {}
    with open(sys.argv[2]) as fd:
        for line in fd:
            src, dst = line.split()
            fold[src] = dst
    with open(sys.argv[1]) as fd:
        for line in fd:
            tokens = line.split()
            if not tokens:
                continue
            folded = [fold.get(p, p) for p in tokens[1:]]
            print(tokens[0] + " " + " ".join(folded))


if __name__ == "__main__":
    main()
