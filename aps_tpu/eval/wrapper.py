#!/usr/bin/env python
"""Checkpoint loading & model evaluation wrapper.

Parity surface: /root/reference/aps/eval/wrapper.py (load_checkpoint:16,
NnetEvaluator:59): rebuilds transform + nnet from the train.yaml next to the
checkpoint and returns the params pytree."""

import pathlib
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import yaml

from aps_tpu.libs import aps_asr_nnet, aps_sse_nnet, aps_transform
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def aps_nnet(name: str):
    """Resolve a registered nnet from either the asr or sse registry."""
    try:
        return aps_asr_nnet(name)
    except ValueError:
        return aps_sse_nnet(name)


def load_checkpoint(cpt_dir: str,
                    cpt_tag: str = "best",
                    nnet_cls: Optional[object] = None) -> Dict:
    """Rebuild nnet from train.yaml + load params from <tag>.ckpt."""
    cpt_dir = pathlib.Path(cpt_dir)
    with open(cpt_dir / f"{cpt_tag}.ckpt", "rb") as fd:
        cpt = pickle.load(fd)
    with open(cpt_dir / "train.yaml", "r") as f:
        conf = yaml.full_load(f)
    if nnet_cls is None:
        nnet_cls = aps_nnet(conf["nnet"])
    asr_transform = None
    enh_transform = None
    accept_raw = False
    if "asr_transform" in conf:
        asr_transform = aps_transform("asr")(**conf["asr_transform"])
        accept_raw = asr_transform.accept_raw
    if "enh_transform" in conf:
        enh_transform = aps_transform("enh")(**conf["enh_transform"])
        accept_raw = True
    kwargs = dict(conf["nnet_conf"])
    if asr_transform is not None:
        kwargs["asr_transform"] = asr_transform
    if enh_transform is not None:
        kwargs["enh_transform"] = enh_transform
    nnet = nnet_cls(**kwargs)
    # task params hold the nnet under the "nnet" scope
    params = cpt["params"]
    if "nnet" in params:
        params = params["nnet"]
    return {
        "epoch": cpt.get("epoch", 0),
        "accept_raw": accept_raw,
        "nnet": nnet,
        "params": params,
        "variables": _split_variables(cpt, params),
        "conf": conf,
    }


def _split_variables(cpt, params):
    variables = {"params": params}
    mstate = cpt.get("mstate", {})
    for k, v in mstate.items():
        if "nnet" in v:
            v = v["nnet"]
        variables[k] = v
    return variables


class NnetEvaluator(object):
    """Wrapper binding (nnet, params) for inference commands."""

    def __init__(self,
                 cpt_dir: str,
                 cpt_tag: str = "best",
                 device_id: int = -1) -> None:
        stats = load_checkpoint(cpt_dir, cpt_tag=cpt_tag)
        self.conf = stats["conf"]
        self.nnet = stats["nnet"]
        self.accept_raw = stats["accept_raw"]
        self.variables = jax.tree_util.tree_map(jnp.asarray,
                                                stats["variables"])
        if device_id >= 0:
            device = jax.devices()[device_id]
            self.variables = jax.device_put(self.variables, device)
        logger.info(f"Load the checkpoint from {cpt_dir}, epoch: "
                    f"{stats['epoch']}, tag: {cpt_tag}")

    def apply(self, *args, method="__call__", **kwargs):
        return self.nnet.apply(self.variables, *args, method=method,
                               **kwargs)

    def run(self, *args, **kwargs):
        raise NotImplementedError
