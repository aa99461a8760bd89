#!/usr/bin/env python
"""Nbest rescoring with NN or ngram LMs (parity:
/root/reference/cmd/lm_rescore.py)."""

import argparse
import pprint
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from aps_tpu.conf import load_dict
from aps_tpu.eval import NnetEvaluator, TextPostProcessor
from aps_tpu.io import NbestReader, io_wrapper
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


_LM_EXECUTABLES = {}


def nn_lm_score(lm, variables, hyp, sos, eos):
    """ln p(hyp) under a NN LM (padded to a small length grid so only a
    few programs compile across the nbest file)."""
    L = len(hyp) + 1
    Lp = max(8, -(-L // 8) * 8)
    seq = np.full((1, Lp), eos, dtype=np.int64)
    seq[0, 0] = sos
    seq[0, 1:L] = hyp
    key = (id(lm), Lp)
    if key not in _LM_EXECUTABLES:
        _LM_EXECUTABLES[key] = jax.jit(lambda v, s: jax.nn.log_softmax(
            lm.apply(v, s, training=False)[0][0], -1))
    logp = np.asarray(_LM_EXECUTABLES[key](variables, jnp.asarray(seq)))
    score = 0.0
    for n, w in enumerate(hyp + [eos]):
        score += float(logp[n, w])
    return score


def run(args):
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    nbest_reader = NbestReader(args.nbest)
    vocab = load_dict(args.dict) if args.dict else None
    if Path(args.lm).is_file():
        from aps_tpu.asr.lm.ngram import NgramLM
        ngram = NgramLM(args.lm, vocab)
        score_fn = lambda hyp: ngram.score(hyp)
    else:
        lm_eval = NnetEvaluator(args.lm, cpt_tag=args.lm_tag,
                                device_id=args.device_id)
        sos = lm_eval.conf["task_conf"].get("sos", 0)
        eos = lm_eval.conf["task_conf"].get("eos", 1)
        score_fn = lambda hyp: nn_lm_score(lm_eval.nnet,
                                           lm_eval.variables, hyp, sos, eos)
    processor = TextPostProcessor(args.dict, space=args.space, spm=args.spm)
    _, out_fd = io_wrapper(args.best, "w")
    rev_vocab = {v: k for k, v in vocab.items()} if vocab else None
    for key, hypos in nbest_reader:
        best, best_score = None, -float("inf")
        for am_score, num_tokens, trans in hypos:
            toks = trans.split()
            ids = [vocab[t] if rev_vocab else int(t) for t in toks] \
                if vocab else [int(t) for t in toks]
            lm_score = score_fn(ids)
            score = am_score + args.lm_weight * lm_score / \
                (max(num_tokens, 1) if args.len_norm else 1)
            if score > best_score:
                best_score, best = score, toks
        out_fd.write(f"{key}\t{' '.join(best)}\n")
    out_fd.close()
    logger.info(f"Rescored {len(nbest_reader)} utterances")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Nbest LM rescoring",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("nbest", type=str)
    parser.add_argument("best", type=str)
    parser.add_argument("--lm", type=str, required=True)
    parser.add_argument("--lm-tag", type=str, default="best")
    parser.add_argument("--lm-weight", type=float, default=0.2)
    parser.add_argument("--len-norm", type=bool, default=True)
    parser.add_argument("--dict", type=str, default="")
    parser.add_argument("--space", type=str, default="")
    parser.add_argument("--spm", type=str, default="")
    parser.add_argument("--device-id", type=int, default=-1)
    run(parser.parse_args())
