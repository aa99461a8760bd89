#!/usr/bin/env python
"""Tokenize kaldi/raw text into modeling units and optionally dump the
vocabulary (python equivalent of the reference's utils/tokenizer.{py,pl};
the heavy lifting lives in aps_tpu.tokenizer). Vocabulary ids follow first
appearance, after any --add-units."""

import argparse

from aps_tpu.io import io_wrapper
from aps_tpu.libs import aps_tokenizer


def build_tokenizer(args):
    kwargs = {"filter_words": args.filter_units.split(",")
              if args.filter_units else []}
    if args.unit == "char":
        kwargs["space"] = args.space
    if args.unit == "subword":
        if not args.spm:
            raise RuntimeError("Missing --spm when choose subword unit")
        kwargs["spm"] = args.spm
    return aps_tokenizer(args.unit)(**kwargs)


def run(args):
    tokenizer = build_tokenizer(args)
    vocab = {}
    if args.dump_vocab:
        for unit in (args.add_units.split(",") if args.add_units else []):
            vocab.setdefault(unit, len(vocab))
        if args.unit == "char" and args.space:
            vocab.setdefault(args.space, len(vocab))

    _, src = io_wrapper(args.src_txt, "r")
    _, dst = io_wrapper(args.dst_tok, "w")
    for line in src:
        tokens = line.split()
        if not tokens:
            continue
        if args.text_format == "kaldi":
            key, words = tokens[0], tokens[1:]
            dst.write(f"{key}\t")
        else:
            words = tokens
        units = tokenizer.encode(words)
        if args.dump_vocab:
            for unit in units:
                vocab.setdefault(unit, len(vocab))
        dst.write(" ".join(units) + "\n")

    if args.dump_vocab:
        _, fd = io_wrapper(args.dump_vocab, "w")
        for unit, idx in vocab.items():
            fd.write(f"{unit} {idx}\n")
        print(f"Dump vocabulary to {args.dump_vocab}: {len(vocab)} units")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Tokenize text to char/word/subword modeling units",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("src_txt", type=str,
                        help="Source text ('-' = stdin)")
    parser.add_argument("dst_tok", type=str,
                        help="Tokenized output ('-' = stdout)")
    parser.add_argument("--text-format", type=str, default="kaldi",
                        choices=["kaldi", "raw"],
                        help="kaldi = first field is the utterance id")
    parser.add_argument("--unit", type=str, default="char",
                        choices=["word", "char", "subword"],
                        help="Modeling unit")
    parser.add_argument("--spm", type=str, default="",
                        help="sentencepiece model for subword units")
    parser.add_argument("--space", type=str, default="",
                        help="Insert this symbol between words (char unit)")
    parser.add_argument("--filter-units", type=str, default="",
                        help="Comma-separated units to drop")
    parser.add_argument("--add-units", type=str, default="",
                        help="Units to prepend to the vocabulary "
                        "(e.g. <sos>,<eos>,<unk>)")
    parser.add_argument("--dump-vocab", type=str, default="",
                        help="Write the vocabulary here")
    run(parser.parse_args())
