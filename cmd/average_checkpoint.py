#!/usr/bin/env python
"""Average trailing epoch checkpoints (parity:
/root/reference/cmd/average_checkpoint.py)."""

import argparse
import pathlib
import pickle

import jax
import numpy as np

from aps_tpu.trainer.base import ParameterAverager
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    cpt_dir = pathlib.Path(args.checkpoint)
    averager = ParameterAverager()
    done = []
    base = None
    for epoch in range(args.beg, args.end + 1):
        path = cpt_dir / f"epoch.{epoch}.ckpt"
        if not path.exists():
            continue
        with open(path, "rb") as fd:
            stats = pickle.load(fd)
        if base is None:
            base = stats
        averager.add(stats["params"])
        done.append(epoch)
    if not done:
        raise RuntimeError(f"No epoch.N.ckpt found in {cpt_dir} "
                           f"for N in [{args.beg}, {args.end}]")
    base["params"] = averager.state_dict()
    with open(args.out, "wb") as fd:
        pickle.dump(base, fd)
    logger.info(f"Averaged {len(done)} checkpoints (epochs {done}) "
                f"-> {args.out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Average model checkpoints over epochs",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint", type=str,
                        help="Checkpoint directory")
    parser.add_argument("out", type=str, help="Output checkpoint path")
    parser.add_argument("--beg", type=int, default=1)
    parser.add_argument("--end", type=int, default=100)
    run(parser.parse_args())
