#!/usr/bin/env python
"""Train a language model (parity: /root/reference/cmd/train_lm.py)."""

import argparse
import pprint

from aps_tpu.conf import dump_dict, load_lm_conf
from aps_tpu.libs import aps_asr_nnet, start_trainer
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
    conf, vocab = load_lm_conf(args.conf, args.dict)

    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    print(f"Arguments in yaml:\n{pprint.pformat(conf)}", flush=True)

    nnet = aps_asr_nnet(conf["nnet"])(**conf["nnet_conf"])
    start_trainer(args.trainer,
                  conf,
                  nnet,
                  args,
                  reduction_tag="#tok",
                  other_loader_conf={
                      "vocab_dict": vocab,
                      "sos": conf["sos"],
                      "eos": conf["eos"],
                  })
    dump_dict(f"{args.checkpoint}/dict", vocab, reverse=False)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Command to train language models (LM) on TPU meshes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[DistributedTrainParser.parser])
    parser.add_argument("--dict", type=str, required=True,
                        help="Dictionary file")
    run(parser.parse_args())
