#!/usr/bin/env python
"""Compute WER/CER between hypothesis and reference transcriptions
(parity: /root/reference/cmd/compute_wer.py)."""

import argparse

from aps_tpu.io import TextReader
from aps_tpu.metric.asr import permute_wer, wer
from aps_tpu.metric.reporter import WerReporter
from aps_tpu.opts import StrToBoolAction


def run(args):
    hyp_reader = TextReader(args.hyp, char=args.cer)
    ref_reader = TextReader(args.ref, char=args.cer)
    reporter = WerReporter(spk2class=args.utt2class,
                           name="CER" if args.cer else "WER", unit="%")
    for key, hyp in hyp_reader:
        if key not in ref_reader:
            continue
        ref = ref_reader[key]
        if args.num_spks > 1:
            hyps = [h.split(",") for h in " ".join(hyp).split(";")]
            refs = [r.split(",") for r in " ".join(ref).split(";")]
            err = permute_wer(hyps, refs, details=args.details)
            tot = sum(len(r) for r in refs)
        else:
            err = wer(hyp, ref, details=args.details)
            tot = len(ref)
        reporter.add(key, err, tot)
    reporter.report()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute WER/CER",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("hyp", type=str, help="Hypothesis transcriptions")
    parser.add_argument("ref", type=str, help="Reference transcriptions")
    parser.add_argument("--cer", action=StrToBoolAction, default=False,
                        nargs="?", const=True,
                        help="Compute CER instead of WER")
    parser.add_argument("--utt2class", type=str, default="",
                        help="utt2class file for per-class breakdown")
    parser.add_argument("--num-spks", type=int, default=1)
    parser.add_argument("--details", action=StrToBoolAction, default=False,
                        nargs="?", const=True)
    run(parser.parse_args())
