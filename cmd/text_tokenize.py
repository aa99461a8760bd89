#!/usr/bin/env python
"""Tokenize text files (word/char/subword) (parity:
/root/reference/cmd/text_tokenize.py and utils/tokenizer.py)."""

import argparse
from collections import Counter

from aps_tpu.io import TextReader, io_wrapper
from aps_tpu.libs import aps_tokenizer
from aps_tpu.opts import StrToBoolAction


def run(args):
    kwargs = {}
    if args.unit == "char":
        kwargs["space"] = args.space
    if args.unit == "subword":
        kwargs["spm"] = args.spm
    tokenizer = aps_tokenizer(args.unit)(
        filter_words=args.filter_words.split(",")
        if args.filter_words else [], **kwargs)
    reader = TextReader(args.text)
    _, out_fd = io_wrapper(args.token, "w")
    counter = Counter()
    for key, words in reader:
        toks = tokenizer.encode(words)
        counter.update(toks)
        out_fd.write(f"{key} {' '.join(toks)}\n")
    out_fd.close()
    if args.dump_vocab:
        with open(args.dump_vocab, "w") as fd:
            fd.write("<unk> 0\n")
            for idx, (tok, _) in enumerate(counter.most_common()):
                fd.write(f"{tok} {idx + 1}\n")
            base = len(counter) + 1
            if args.add_sos_eos:
                fd.write(f"<sos> {base}\n<eos> {base + 1}\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Tokenize transcriptions",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("text", type=str)
    parser.add_argument("token", type=str)
    parser.add_argument("--unit", type=str, default="char",
                        choices=["word", "char", "subword"])
    parser.add_argument("--space", type=str, default="<space>")
    parser.add_argument("--spm", type=str, default="")
    parser.add_argument("--filter-words", type=str, default="")
    parser.add_argument("--dump-vocab", type=str, default="")
    parser.add_argument("--add-sos-eos", action=StrToBoolAction,
                        default=True, nargs="?", const=True)
    run(parser.parse_args())
