#!/usr/bin/env python
"""Pack wav files into archives + scp with offsets (parity:
/root/reference/cmd/archive_wav.py; our format: "key ark_path:offset" with
a plain wav payload at the offset, which aps_tpu.io.AudioReader consumes).
Supports kaldi segments files (archive per-segment slices) and parallel
packing into N ark shards."""

import argparse
import multiprocessing as mp
import os

from aps_tpu.io import AudioReader, group_segments, write_audio
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
    # AudioReader handles plain files, "cmd ... |" pipes and ark:offset
    # entries alike
    reader = AudioReader(args.wav_scp, sr=args.sr)
    sr = args.sr if args.sr > 0 else 16000
    segments = group_segments(args.segment, sr) if args.segment else None
    done, failed = 0, 0
    with open(ark_path, "wb") as ark, open(scp_path, "w") as scp:

        def emit(key, samps):
            offset = ark.tell()
            write_audio(ark, samps, sr=sr)
            scp.write(f"{key} {ark_path}:{offset}\n")

        for n, key in enumerate(reader.index_keys):
            if n % num_shards != jobid:
                continue
            try:
                samps = reader[key]
            except Exception as exc:
                logger.warning(f"Worker {jobid}: reading {key} failed "
                               f"({exc}), skipped")
                failed += 1
                continue
            if segments is None:
                emit(key, samps)
            elif key in segments:
                for seg_key, beg, end in segments[key]:
                    emit(seg_key, samps[..., beg:end])
            done += 1
            if done % PROG_INTERVAL == 0:
                logger.info(f"Worker {jobid}: {done} utterances...")
    if failed and not done:
        raise RuntimeError(
            f"Worker {jobid}: ALL {failed} utterances failed to read — "
            f"check --sr and the wav.scp entries")
    logger.info(f"Worker {jobid}: archived {done} utterances to {ark_path}")
    return scp_path


def run(args):
    # --num-arks alone decides the shard count; --num-jobs only bounds the
    # worker pool (an ark shard is written by exactly one worker, so extra
    # jobs beyond the shard count would sit idle)
    shards = max(args.num_arks, 1)
    if args.num_jobs > shards:
        logger.info(f"--num-jobs {args.num_jobs} > --num-arks {shards}: "
                    f"only {shards} workers can run (one per ark shard)")
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
