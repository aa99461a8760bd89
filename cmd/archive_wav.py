#!/usr/bin/env python
"""Pack wav files into archives + scp with offsets (parity:
/root/reference/cmd/archive_wav.py; our format: "key ark_path:offset" with
a plain wav payload at the offset, which aps_tpu.io.AudioReader consumes).
Supports kaldi segments files (archive per-segment slices) and parallel
packing into N ark shards."""

import argparse
import multiprocessing as mp
import os
import subprocess

from aps_tpu.io import group_segments, read_audio, write_audio
from aps_tpu.io.base import BaseReader
from aps_tpu.utils import get_logger

logger = get_logger(__name__)
PROG_INTERVAL = 500


def _pack(jobid: int, num_shards: int, args) -> str:
    """Archive every num_shards-th utterance into shard `jobid`."""
    if num_shards > 1:
        stem, ext = os.path.splitext(args.out_ark)
        ark_path = f"{stem}.{jobid}{ext}"
        scp_path = f"{os.path.splitext(args.out_scp)[0]}.{jobid}.scp"
    else:
        ark_path, scp_path = args.out_ark, args.out_scp
    reader = BaseReader(args.wav_scp, num_tokens=2)
    segments = group_segments(args.segment, args.sr) if args.segment else None
    done = 0
    with open(ark_path, "wb") as ark, open(scp_path, "w") as scp:

        def emit(key, samps):
            offset = ark.tell()
            write_audio(ark, samps, sr=args.sr)
            scp.write(f"{key} {ark_path}:{offset}\n")

        for n, (key, value) in enumerate(reader):
            if n % num_shards != jobid:
                continue
            try:
                if value.endswith("|"):
                    out = subprocess.check_output(value[:-1], shell=True)
                    import io as _io
                    samps = read_audio(_io.BytesIO(out), sr=args.sr)
                else:
                    samps = read_audio(value, sr=args.sr)
            except Exception as exc:
                logger.warning(f"Worker {jobid}: reading {key} failed "
                               f"({exc}), skipped")
                continue
            if segments is None:
                emit(key, samps)
            elif key in segments:
                for seg_key, beg, end in segments[key]:
                    emit(seg_key, samps[..., beg:end])
            done += 1
            if done % PROG_INTERVAL == 0:
                logger.info(f"Worker {jobid}: {done} utterances...")
    logger.info(f"Worker {jobid}: archived {done} utterances to {ark_path}")
    return scp_path


def run(args):
    shards = max(args.num_arks, args.num_jobs, 1)
    if shards == 1:
        _pack(0, 1, args)
        return
    with mp.Pool(min(args.num_jobs, shards)) as pool:
        scps = pool.starmap(_pack, [(n, shards, args) for n in range(shards)])
    with open(args.out_scp, "w") as out:
        entries = []
        for scp in scps:
            with open(scp) as fd:
                entries += fd.readlines()
            os.remove(scp)
        out.writelines(sorted(entries))
    logger.info(f"Merged {len(scps)} shard scps into {args.out_scp}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Archive wav files into ark shards",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_ark", type=str)
    parser.add_argument("out_scp", type=str)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--num-jobs", type=int, default=1,
                        help="Parallel packing processes")
    parser.add_argument("--num-arks", type=int, default=1,
                        help="Number of ark shards to produce")
    parser.add_argument("--segment", type=str, default="",
                        help="Kaldi segments file: archive per-segment "
                        "slices instead of whole utterances")
    run(parser.parse_args())
