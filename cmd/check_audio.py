#!/usr/bin/env python
"""Check audio readability & report durations (parity:
/root/reference/cmd/check_audio.py). Also emits utt2dur."""

import argparse

from aps_tpu.io import AudioReader, io_wrapper
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    reader = AudioReader(args.wav_scp, sr=args.sr, failed_if_error=False)
    _, dur_fd = io_wrapper(args.utt2dur, "w") if args.utt2dur else (None,
                                                                    None)
    bad = 0
    for key in reader.index_keys:
        samps = reader[key]
        if samps is None:
            logger.info(f"Bad utterance: {key}")
            bad += 1
            continue
        if dur_fd:
            dur = samps.shape[-1] / args.sr
            dur_fd.write(f"{key} {dur:.4f}\n")
    if dur_fd:
        dur_fd.close()
    logger.info(f"Checked {len(reader)} utterances, {bad} bad")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Check audio & dump durations",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("--utt2dur", type=str, default="")
    parser.add_argument("--sr", type=int, default=16000)
    run(parser.parse_args())
