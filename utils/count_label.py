#!/usr/bin/env python
"""Count token frequencies for unigram label smoothing (parity:
reference utils/count_label.py)."""
import argparse
from collections import Counter

parser = argparse.ArgumentParser()
parser.add_argument("token", help="tokenized text (kaldi format)")
parser.add_argument("count", help="output label count file")
parser.add_argument("--vocab-size", type=int, required=True)
args = parser.parse_args()
counter = Counter()
with open(args.token) as fd:
    for line in fd:
        toks = line.strip().split()[1:]
        counter.update(int(t) for t in toks)
with open(args.count, "w") as fd:
    for idx in range(args.vocab_size):
        fd.write(f"{counter.get(idx, 0)}\n")
