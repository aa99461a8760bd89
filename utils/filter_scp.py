#!/usr/bin/env python
"""Filter a kaldi-style scp/text file by an id list (python equivalent of
the reference's utils/filter_scp.pl): keep (or, with --exclude, drop) the
lines whose f-th field appears as the first field of any id_list line."""

import argparse
import sys


def load_ids(path: str):
    with open(path, "r", encoding="utf-8") as fd:
        return {
            line.split()[0]
            for line in fd if line.strip()
        }


def run(args):
    ids = load_ids(args.id_list)
    src = open(args.in_scp, "r", encoding="utf-8") \
        if args.in_scp != "-" else sys.stdin
    for line in src:
        tokens = line.split()
        if len(tokens) < args.field:
            continue
        hit = tokens[args.field - 1] in ids
        if hit != args.exclude:
            sys.stdout.write(line)
    if src is not sys.stdin:
        src.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Filter scp/text lines by an utterance-id list",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("id_list", type=str,
                        help="File whose first field per line is an id")
    parser.add_argument("in_scp", type=str, nargs="?", default="-",
                        help="Input scp ('-' = stdin); output goes to stdout")
    parser.add_argument("-f", dest="field", type=int, default=1,
                        help="1-based field to match against the id list")
    parser.add_argument("--exclude", action="store_true",
                        help="Print lines NOT in the id list")
    run(parser.parse_args())
