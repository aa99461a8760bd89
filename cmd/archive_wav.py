#!/usr/bin/env python
"""Pack wav files into a single archive + scp with offsets (parity:
/root/reference/cmd/archive_wav.py; format: "key ark_path:offset")."""

import argparse

from aps_tpu.io import AudioReader, write_audio
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    reader = AudioReader(args.wav_scp, sr=-1 if args.sr < 0 else args.sr)
    with open(args.out_ark, "wb") as ark, open(args.out_scp, "w") as scp:
        for done, (key, samps) in enumerate(reader, 1):
            offset = ark.tell()
            write_audio(ark, samps, sr=args.sr if args.sr > 0 else 16000)
            scp.write(f"{key} {args.out_ark}:{offset}\n")
            if done % 100 == 0:
                logger.info(f"Archived {done} utterances...")
    logger.info(f"Archived {len(reader)} utterances to {args.out_ark}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Archive wav files into one ark",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_ark", type=str)
    parser.add_argument("out_scp", type=str)
    parser.add_argument("--sr", type=int, default=16000)
    run(parser.parse_args())
