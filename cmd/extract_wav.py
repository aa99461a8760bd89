#!/usr/bin/env python
"""Extract wav files from archives back to individual files (parity:
/root/reference/cmd/extract_wav.py)."""

import argparse
import pathlib

from aps_tpu.io import AudioReader, SegmentAudioReader, write_audio
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.segment:
        reader = SegmentAudioReader(args.wav_scp, args.segment, sr=args.sr,
                                    channel=args.channel)
    else:
        reader = AudioReader(args.wav_scp, sr=args.sr, channel=args.channel)
    done = 0
    for done, (key, samps) in enumerate(reader, 1):
        write_audio(str(out_dir / f"{key}.wav"), samps, sr=args.sr)
        if done % 100 == 0:
            logger.info(f"Extracted {done} utterances...")
    logger.info(f"Extracted {done} utterances to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Extract wavs from wav.scp/archives",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--channel", type=int, default=-1,
                        help="Channel to keep for multi-channel audio "
                        "(-1: all)")
    parser.add_argument("--segment", type=str, default="",
                        help="Kaldi segments file: extract per-segment "
                        "slices")
    run(parser.parse_args())
