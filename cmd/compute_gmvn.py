#!/usr/bin/env python
"""Compute global CMVN statistics over transform outputs (parity:
/root/reference/cmd/compute_gmvn.py). Saves a (2, D) numpy array
[mean; std] consumed by CmvnTransform(gcmvn=...)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from aps_tpu.io import AudioReader
from aps_tpu.libs import aps_transform
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    with open(args.conf, "r") as f:
        conf = yaml.full_load(f)
    key = "asr_transform" if "asr_transform" in conf else "enh_transform"
    if key not in conf:
        raise RuntimeError(f"No transform configuration found in "
                           f"{args.conf}")
    trans_conf = dict(conf[key])
    # no augmentation / utterance cmvn during statistics collection
    trans_conf["aug_prob"] = 0
    feats = trans_conf.get("feats", "")
    trans_conf["feats"] = "-".join(
        t for t in feats.split("-") if t not in ("aug", "cmvn", "perturb"))
    transform = aps_transform("asr")(**trans_conf)

    reader = AudioReader(args.wav_scp, sr=args.sr, channel=args.channel)
    variables = None
    acc_sum, acc_sqr, cnt = 0, 0, 0
    for idx, (k, wav) in enumerate(reader):
        wav = jnp.asarray(wav[None, ...])
        if variables is None:
            variables = transform.init(jax.random.PRNGKey(0), wav, None)
        out, _ = transform.apply(variables, wav, None)
        out = np.asarray(out).reshape(-1, out.shape[-1])
        acc_sum = acc_sum + out.sum(0)
        acc_sqr = acc_sqr + (out**2).sum(0)
        cnt += out.shape[0]
        if (idx + 1) % 100 == 0:
            logger.info(f"Processed {idx + 1} utterances...")
        if args.num_utts > 0 and idx + 1 >= args.num_utts:
            break
    mean = acc_sum / cnt
    std = np.sqrt(acc_sqr / cnt - mean**2)
    np.save(args.out_npy, np.stack([mean, std]).astype(np.float32))
    logger.info(f"Saved gcmvn stats over {cnt} frames to {args.out_npy}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute global CMVN statistics",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_npy", type=str)
    parser.add_argument("--conf", type=str, required=True,
                        help="Training yaml with the transform config")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--channel", type=int, default=-1)
    parser.add_argument("--num-utts", type=int, default=-1,
                        help="Cap the number of utterances used")
    run(parser.parse_args())
