#!/usr/bin/env python
"""CTC viterbi alignment (parity: /root/reference/cmd/align.py)."""

import argparse
import pprint

import jax.numpy as jnp
import numpy as np

from aps_tpu.eval import NnetEvaluator, TextPreProcessor
from aps_tpu.io import AudioReader, TextReader, io_wrapper
from aps_tpu.opts import AlignmentParser
from aps_tpu.utils import get_logger

logger = get_logger(__name__)


def run(args):
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    evaluator = NnetEvaluator(args.am, cpt_tag=args.am_tag,
                              device_id=args.device_id)
    vocab_size = evaluator.conf["nnet_conf"]["vocab_size"]
    blank = vocab_size - 1
    from aps_tpu.asr.beam_search.ctc import CtcApi
    api = CtcApi(blank)
    wav_reader = AudioReader(args.wav_scp, sr=args.sr,
                             channel=args.channel)
    txt_reader = TextReader(args.text)
    processor = TextPreProcessor(args.dict, space=args.space, spm=args.spm)
    _, ali_fd = io_wrapper(args.alignment, "w")
    done = 0
    for key, wav in wav_reader:
        if key not in txt_reader:
            continue
        seq = processor.run(txt_reader[key])
        from aps_tpu.asr.beam_search.utils import jit_apply
        from aps_tpu.loader.utils import quantize_len
        # pad onto the geometric grid: one compiled program per bucket
        S = wav.shape[-1]
        wav = np.pad(wav, (0, quantize_len(S, floor=16000) - S))
        logits, n_frames = jit_apply(evaluator.nnet, evaluator.variables,
                                     jnp.asarray(wav)[None],
                                     jnp.asarray([S]),
                                     method="ctc_logits")
        logits = logits[:, :int(n_frames[0])]
        out = api.viterbi_align(logits[0], np.asarray(seq))
        ali = " ".join(map(str, out["align"]))
        ali_fd.write(f"{key} {out['score']:.3f} {ali}\n")
        done += 1
        if done % 50 == 0:
            logger.info(f"Aligned {done} utterances...")
    logger.info(f"Aligned {done} utterances done")
    ali_fd.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="CTC viterbi alignment",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[AlignmentParser.parser])
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--space", type=str, default="")
    parser.add_argument("--spm", type=str, default="")
    run(parser.parse_args())
