#!/usr/bin/env python
"""Compute global CMVN statistics over transform outputs (parity:
/root/reference/cmd/compute_gmvn.py). Saves a (2, D) numpy array
[mean; std] consumed by CmvnTransform(gcmvn=...)."""

import argparse

import numpy as np
import yaml

from aps_tpu.utils import get_logger

logger = get_logger(__name__)

# stages that must not contribute to the statistics (randomized or
# normalizing themselves)
KEYS_TO_REMOVE = ("perturb", "cmvn", "aug", "delta", "splice")


def _build_transform(conf_path: str, which: str):
    from aps_tpu.libs import aps_transform
    with open(conf_path, "r") as f:
        conf = yaml.full_load(f)
    if which == "auto":
        which = "asr" if "asr_transform" in conf else "enh"
    key = f"{which}_transform"
    if key not in conf:
        raise RuntimeError(f"No {key} configuration found in {conf_path}")
    trans_conf = dict(conf[key])
    trans_conf["aug_prob"] = 0
    feats = trans_conf.get("feats", "")
    trans_conf["feats"] = "-".join(
        t for t in feats.split("-") if t not in KEYS_TO_REMOVE)
    logger.info(f"Compute gmvn on feature {trans_conf['feats']}")
    return aps_transform("asr")(**trans_conf)


def _accumulate(jobid: int, num_jobs: int, args):
    """Partial (sum, sum-of-squares, #frames) over every num_jobs-th utt."""
    import os
    if num_jobs > 1:
        # spawned workers must not fight over a single accelerator (TPU
        # runtimes are one-client-per-chip); stats accumulation is cheap
        # enough on CPU
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    if num_jobs > 1:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aps_tpu.io import AudioReader, SegmentAudioReader

    transform = _build_transform(args.conf, args.transform)
    if args.segment:
        reader = SegmentAudioReader(args.wav_scp, args.segment, sr=args.sr,
                                    channel=args.channel)
    else:
        reader = AudioReader(args.wav_scp, sr=args.sr, channel=args.channel)
    variables = None
    acc_sum, acc_sqr, cnt, done = 0, 0, 0, 0
    for idx, (k, wav) in enumerate(reader):
        if idx % num_jobs != jobid:
            continue
        wav = jnp.asarray(wav[None, ...])
        if variables is None:
            variables = transform.init(jax.random.PRNGKey(0), wav, None)
        out, _ = transform.apply(variables, wav, None)
        out = np.asarray(out).reshape(-1, out.shape[-1])
        acc_sum = acc_sum + out.sum(0)
        acc_sqr = acc_sqr + (out**2).sum(0)
        cnt += out.shape[0]
        done += 1
        if done % 100 == 0:
            logger.info(f"Worker {jobid}: processed {done} utterances...")
        if args.num_utts > 0 and done >= max(args.num_utts // num_jobs, 1):
            break
    return acc_sum, acc_sqr, cnt


def run(args):
    if args.num_jobs <= 1:
        parts = [_accumulate(0, 1, args)]
    else:
        import multiprocessing as mp
        # spawn: never fork a process that may have initialized jax
        ctx = mp.get_context("spawn")
        with ctx.Pool(args.num_jobs) as pool:
            parts = pool.starmap(
                _accumulate,
                [(j, args.num_jobs, args) for j in range(args.num_jobs)])
    acc_sum = sum(p[0] for p in parts)
    acc_sqr = sum(p[1] for p in parts)
    cnt = sum(p[2] for p in parts)
    mean = acc_sum / cnt
    std = np.sqrt(acc_sqr / cnt - mean**2)
    gmvn = np.stack([mean, std]).astype(np.float32)
    if np.isnan(gmvn).any():
        raise RuntimeError("Got NaN in gmvn statistics, please check")
    np.save(args.out_npy, gmvn)
    logger.info(f"Saved gcmvn stats over {cnt} frames to {args.out_npy}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute global CMVN statistics",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wav_scp", type=str)
    parser.add_argument("out_npy", type=str)
    parser.add_argument("--conf", type=str, required=True,
                        help="Training yaml with the transform config")
    parser.add_argument("--transform", type=str, default="auto",
                        choices=["auto", "asr", "enh"],
                        help="Which transform section to use")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--channel", type=int, default=-1)
    parser.add_argument("--segment", type=str, default="",
                        help="Kaldi segments file")
    parser.add_argument("--num-jobs", type=int, default=1,
                        help="Parallel accumulation processes")
    parser.add_argument("--num-utts", type=int, default=-1,
                        help="Cap the number of utterances used")
    run(parser.parse_args())
