#!/usr/bin/env python
"""Build noisy/clean scps from a DNS-Challenge synthesized directory
(noisy/ + clean/ wavs paired by the fileid_N suffix), holding out every
K-th pair as the dev split."""

import argparse
import glob
import os
import re


def main():
    parser = argparse.ArgumentParser(
        description="Prepare DNS noisy/clean scps",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("dns_dir",
                        help="synthesized data root (noisy/ clean/)")
    parser.add_argument("out_dir")
    parser.add_argument("--dev-every", type=int, default=50,
                        help="hold out every K-th pair for validation")
    args = parser.parse_args()

    clean = {}
    for wav in glob.glob(f"{args.dns_dir}/clean/*.wav"):
        m = re.search(r"fileid_(\d+)\.wav$", wav)
        if m:
            clean[m.group(1)] = wav
    pairs = []
    for wav in sorted(glob.glob(f"{args.dns_dir}/noisy/*.wav")):
        m = re.search(r"fileid_(\d+)\.wav$", wav)
        if m and m.group(1) in clean:
            pairs.append((f"fileid_{m.group(1)}", wav, clean[m.group(1)]))

    splits = {"train": [], "dev": []}
    for i, pair in enumerate(pairs):
        splits["dev" if i % args.dev_every == 0 else "train"].append(pair)
    for name, rows in splits.items():
        out = os.path.join(args.out_dir, name)
        os.makedirs(out, exist_ok=True)
        with open(f"{out}/noisy.scp", "w") as nf, \
                open(f"{out}/clean.scp", "w") as cf:
            for key, noisy, cln in rows:
                nf.write(f"{key} {noisy}\n")
                cf.write(f"{key} {cln}\n")
        print(f"{name}: {len(rows)} pairs")


if __name__ == "__main__":
    main()
