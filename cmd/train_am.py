#!/usr/bin/env python
"""Train an acoustic model (parity: /root/reference/cmd/train_am.py).
One process drives the whole TPU mesh (SPMD) — no torchrun/horovodrun."""

import argparse
import pprint

from aps_tpu.conf import dump_dict, load_am_conf
from aps_tpu.libs import aps_asr_nnet, aps_transform, start_trainer
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
    conf, vocab = load_am_conf(args.conf, args.dict)

    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    print(f"Arguments in yaml:\n{pprint.pformat(conf)}", flush=True)

    asr_cls = aps_asr_nnet(conf["nnet"])
    kwargs = dict(conf["nnet_conf"])
    if "asr_transform" in conf:
        kwargs["asr_transform"] = aps_transform("asr")(
            **conf["asr_transform"])
    if "enh_transform" in conf:
        kwargs["enh_transform"] = aps_transform("enh")(
            **conf["enh_transform"])
    nnet = asr_cls(**kwargs)

    start_trainer(args.trainer,
                  conf,
                  nnet,
                  args,
                  reduction_tag="#tok",
                  other_loader_conf={"vocab_dict": vocab})
    dump_dict(f"{args.checkpoint}/dict", vocab, reverse=False)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Command to train acoustic models (AM) on TPU meshes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[DistributedTrainParser.parser])
    parser.add_argument("--dict", type=str, required=True,
                        help="Dictionary file")
    run(parser.parse_args())
