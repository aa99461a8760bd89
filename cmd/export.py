#!/usr/bin/env python
"""Export a trained model to StableHLO for the native runtime.

Parity surface: /root/reference/cmd/export_for_libtorch.py — the reference
exports TorchScript for the C++ runtime; here we export the (feature ->
mask/logits) function via jax.export (StableHLO bytes + a meta json), which
the deployment runtime loads through PJRT (or re-imports in python)."""

import argparse
import json
import pathlib
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from aps_tpu.eval import NnetEvaluator
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    evaluator = NnetEvaluator(args.checkpoint, cpt_tag=args.tag,
                              device_id=-1)
    nnet = evaluator.nnet
    variables = evaluator.variables
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # export the frame-level mask/posterior function on fixed chunk shapes
    N, T, F = 1, args.num_frames, args.num_bins

    method = args.function

    def fn(feats):
        return nnet.apply(variables, feats, method=method)

    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((N, T, F), jnp.float32))
    blob = exported.serialize()
    with open(out_dir / "model.stablehlo", "wb") as fd:
        fd.write(blob)
    meta = {
        "nnet": evaluator.conf["nnet"],
        "function": method,
        "input_shape": [N, T, F],
        "conf": {k: v for k, v in evaluator.conf.items()
                 if k in ("nnet", "enh_transform", "asr_transform")},
    }
    with open(out_dir / "model.json", "w") as fd:
        json.dump(meta, fd, indent=2, default=str)
    logger.info(f"Exported {method} ({len(blob)} bytes StableHLO) "
                f"to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Export models via jax.export (StableHLO)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--tag", type=str, default="best")
    parser.add_argument("--function", type=str, default="mask_predict")
    parser.add_argument("--num-frames", type=int, default=21,
                        help="Chunk frames of the exported function")
    parser.add_argument("--num-bins", type=int, default=257)
    run(parser.parse_args())
