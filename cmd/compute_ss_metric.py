#!/usr/bin/env python
"""Compute SiSNR/PESQ/STOI/SDR between separated and reference audio
(parity: /root/reference/cmd/compute_ss_metric.py)."""

import argparse

import numpy as np

from aps_tpu.io import AudioReader
from aps_tpu.metric.reporter import AverageReporter
from aps_tpu.metric.sse import permute_sse_metric


def run(args):
    sep_scps = args.sep_scp.split(",")
    ref_scps = args.ref_scp.split(",")
    assert len(sep_scps) == len(ref_scps)
    sep_readers = [AudioReader(scp, sr=args.sr) for scp in sep_scps]
    ref_readers = [AudioReader(scp, sr=args.sr) for scp in ref_scps]
    units = {"sisnr": "dB", "snr": "dB", "sdr": "dB", "pesq": "MOS",
             "stoi": ""}
    reporter = AverageReporter(spk2class=args.utt2class,
                               name=args.metric.upper(),
                               unit=units.get(args.metric, ""))
    for key, _ in sep_readers[0]:
        sep = [r[key] for r in sep_readers]
        ref = [r[key] for r in ref_readers]
        S = min(min(s.shape[-1] for s in sep),
                min(r.shape[-1] for r in ref))
        sep = np.stack([s[..., :S] for s in sep])
        ref = np.stack([r[..., :S] for r in ref])
        if len(sep_readers) == 1:
            sep, ref = sep[0], ref[0]
        val = permute_sse_metric(args.metric, ref, sep, fs=args.sr)
        reporter.add(key, val)
    reporter.report()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute SSE metrics (SiSNR/PESQ/STOI/SDR)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("sep_scp", type=str,
                        help="Separated audio scp (comma-separated list)")
    parser.add_argument("ref_scp", type=str,
                        help="Reference audio scp (comma-separated list)")
    parser.add_argument("--metric", type=str, default="sisnr",
                        choices=["sisnr", "snr", "pesq", "stoi", "sdr"])
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--utt2class", type=str, default="")
    run(parser.parse_args())
