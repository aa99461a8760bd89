#!/usr/bin/env python
"""Create a tiny randomly-initialized rt_sse checkpoint for the real-time
enhancement demos (C++ and python). Mirrors the artifact layout produced by
the trainer (train.yaml + <tag>.ckpt)."""

import argparse
import os
import pickle

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import yaml  # noqa: E402

from aps_tpu.libs import aps_sse_nnet, aps_transform  # noqa: E402


def run(args):
    enh_conf = {
        "feats": "spectrogram-log",
        "frame_len": args.frame_len,
        "frame_hop": args.frame_hop,
        "window": args.window,
        "center": False,
    }
    if args.nnet == "rt_sse@dfsmn":
        nnet_conf = {
            "dim": 64,
            "num_bins": args.frame_len // 2 + 1,
            "num_layers": args.num_layers,
            "project": 32,
            "lctx": args.lctx,
            "rctx": args.rctx,
            "norm": "LN",
            "complex_mask": True,
        }
    else:
        nnet_conf = {
            "num_bins": args.frame_len // 2 + 1,
            "num_layers": args.num_layers,
            "chunk": 1,
            "lctx": args.lctx,
            "arch_kwargs": {
                "att_dim": 32,
                "nhead": 4,
                "feedforward_dim": 64,
            },
            "complex_mask": True,
        }
    enh_transform = aps_transform("enh")(**enh_conf)
    nnet = aps_sse_nnet(args.nnet)(enh_transform=enh_transform, **nnet_conf)
    mix = jnp.zeros((1, args.frame_len * 8), dtype=jnp.float32)
    variables = nnet.init(jax.random.PRNGKey(0), mix, training=False)
    params = jax.device_get(variables["params"])
    mstate = {
        k: jax.device_get(v)
        for k, v in variables.items() if k != "params"
    }
    os.makedirs(args.cpt_dir, exist_ok=True)
    with open(os.path.join(args.cpt_dir, "train.yaml"), "w") as f:
        yaml.dump(
            {
                "nnet": args.nnet,
                "nnet_conf": nnet_conf,
                "enh_transform": enh_conf,
            }, f)
    cpt = {"params": params, "mstate": mstate, "epoch": 0}
    with open(os.path.join(args.cpt_dir, "best.ckpt"), "wb") as f:
        pickle.dump(cpt, f)
    print(f"wrote toy {args.nnet} checkpoint to {args.cpt_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="make toy rt_sse checkpoint")
    parser.add_argument("cpt_dir")
    parser.add_argument("--nnet",
                        default="rt_sse@dfsmn",
                        choices=["rt_sse@dfsmn", "rt_sse@freq_xfmr"])
    parser.add_argument("--frame-len", type=int, default=512)
    parser.add_argument("--frame-hop", type=int, default=256)
    parser.add_argument("--window", default="sqrthann")
    parser.add_argument("--num-layers", type=int, default=2)
    parser.add_argument("--lctx", type=int, default=2)
    parser.add_argument("--rctx", type=int, default=2)
    run(parser.parse_args())
