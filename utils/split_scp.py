#!/usr/bin/env python
"""Split a scp/text file into N near-equal chunks (python equivalent of the
reference's utils/split_scp.pl). With --utt2spk, chunk boundaries respect
speaker boundaries; with -j N I, only the I-th of N chunks is written."""

import argparse
import sys
from itertools import groupby


def _chunk_bounds(total: int, num: int):
    """Near-equal split points: the first (total % num) chunks get one
    extra item."""
    base, extra = divmod(total, num)
    sizes = [base + (1 if i < extra else 0) for i in range(num)]
    bounds, at = [], 0
    for s in sizes:
        bounds.append((at, at + s))
        at += s
    return bounds


def _groups(lines, utt2spk: str):
    """Lines grouped into atomic units: single lines, or per-speaker runs
    when utt2spk is given (chunks never split a speaker)."""
    if not utt2spk:
        return [[ln] for ln in lines]
    spk_of = {}
    with open(utt2spk, "r", encoding="utf-8") as fd:
        for ln in fd:
            tokens = ln.split()
            if len(tokens) >= 2:
                spk_of[tokens[0]] = tokens[1]
    keyed = [(spk_of.get(ln.split()[0], ln.split()[0]), ln) for ln in lines]
    return [[ln for _, ln in grp]
            for _, grp in groupby(keyed, key=lambda kv: kv[0])]


def run(args):
    with open(args.in_scp, "r", encoding="utf-8") as fd:
        lines = [ln for ln in fd if ln.strip()]
    if args.num_jobs > 0:
        num_split, want = args.num_jobs, [args.job_id]
        outs = [args.out_scps[0]]
        if len(args.out_scps) != 1:
            raise RuntimeError("-j mode writes exactly one output file")
    else:
        num_split = len(args.out_scps)
        want = list(range(num_split))
        outs = args.out_scps
    if num_split < 1:
        raise RuntimeError("Need at least one output chunk")

    groups = _groups(lines, args.utt2spk)
    if len(groups) < num_split:
        sys.exit(f"split_scp: {len(groups)} units cannot fill "
                 f"{num_split} chunks")
    # distribute whole groups, balancing by line count
    chunks = [[] for _ in range(num_split)]
    counts = [0] * num_split
    bounds = _chunk_bounds(len(lines), num_split)
    at = 0
    for grp in groups:
        # advance to the next chunk once the current one has its share
        while at < num_split - 1 and counts[at] >= bounds[at][1] - \
                bounds[at][0]:
            at += 1
        chunks[at].extend(grp)
        counts[at] += len(grp)
    for idx, path in zip(want, outs):
        with open(path, "w", encoding="utf-8") as fd:
            fd.writelines(chunks[idx])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Split a scp/text file into near-equal chunks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-j", dest="jn", type=int, nargs=2, default=None,
                        metavar=("NUM_JOBS", "JOB_ID"),
                        help="Write only chunk JOB_ID (0-based) of NUM_JOBS")
    parser.add_argument("--utt2spk", type=str, default="",
                        help="utt2spk map; keeps speakers in one chunk")
    parser.add_argument("in_scp", type=str, help="Input scp/text file")
    parser.add_argument("out_scps", type=str, nargs="+",
                        help="Output chunk files")
    args = parser.parse_args()
    args.num_jobs = args.jn[0] if args.jn else 0
    args.job_id = args.jn[1] if args.jn else 0
    if args.jn and not (0 <= args.job_id < args.num_jobs):
        sys.exit(f"Invalid -j spec: {args.num_jobs} {args.job_id}")
    run(args)
