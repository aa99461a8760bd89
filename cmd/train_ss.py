#!/usr/bin/env python
"""Train a separation/enhancement model (parity:
/root/reference/cmd/train_ss.py)."""

import argparse
import pprint

from aps_tpu.conf import load_ss_conf
from aps_tpu.libs import aps_sse_nnet, aps_transform, start_trainer
from aps_tpu.opts import DistributedTrainParser
from aps_tpu.utils import set_seed
import aps_tpu.distributed as dist


def run(args):
    # multi-process rendezvous MUST precede any backend-initialising jax
    # call (set_seed builds a PRNGKey; the compilation cache touches the
    # client): jax.distributed.initialize rejects an already-live backend
    dist.init(getattr(args, "distributed", "none"),
              coordinator_address=getattr(args, "coordinator_address", ""),
              num_processes=getattr(args, "num_processes", 1),
              process_id=getattr(args, "process_id", 0))
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    set_seed(args.seed)
    conf = load_ss_conf(args.conf)

    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    print(f"Arguments in yaml:\n{pprint.pformat(conf)}", flush=True)

    sse_cls = aps_sse_nnet(conf["nnet"])
    kwargs = dict(conf["nnet_conf"])
    if "enh_transform" in conf:
        kwargs["enh_transform"] = aps_transform("enh")(
            **conf["enh_transform"])
    nnet = sse_cls(**kwargs)
    start_trainer(args.trainer, conf, nnet, args, reduction_tag="#utt")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Command to train separation/enhancement models on TPU",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[DistributedTrainParser.parser])
    run(parser.parse_args())
