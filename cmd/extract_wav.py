#!/usr/bin/env python
"""Extract wav files from archives back to individual files (parity:
/root/reference/cmd/extract_wav.py)."""

import argparse
import pathlib

from aps_tpu.io import AudioReader, write_audio
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    reader = AudioReader(args.wav_scp, sr=args.sr)
    for done, (key, samps) in enumerate(reader, 1):
        write_audio(str(out_dir / f"{key}.wav"), samps, sr=args.sr)
        if done % 100 == 0:
            logger.info(f"Extracted {done} utterances...")
    logger.info(f"Extracted {len(reader)} utterances to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Extract wavs from wav.scp/archives",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--sr", type=int, default=16000)
    run(parser.parse_args())
