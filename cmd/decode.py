#!/usr/bin/env python
"""ASR beam-search decoding (parity: /root/reference/cmd/decode.py).

Nbest format:
    <nbest n>
    key1
    score-1 num-tok-1 hyp-1
    ...
"""

import argparse
import pprint
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from aps_tpu.conf import load_dict
from aps_tpu.eval import NnetEvaluator, TextPostProcessor
from aps_tpu.io import AudioReader, SegmentAudioReader, io_wrapper
from aps_tpu.loader.kaldi_io import ScriptReader
from aps_tpu.opts import DecodingParser, StrToBoolAction
from aps_tpu.utils import SimpleTimer, get_logger

logger = get_logger(__name__)

beam_search_params = [
    "beam_size", "nbest", "max_len", "min_len", "len_norm", "lm_weight",
    "ctc_weight", "temperature", "len_penalty", "cov_penalty",
    "eos_threshold", "cov_threshold", "allow_partial", "end_detect",
    "approx_topk", "dtype"
]


class FasterDecoder(NnetEvaluator):
    """Single-utterance decoder wrapper (compiled beam search)."""

    def __init__(self, cpt_dir, cpt_tag="best", function="beam_search",
                 device_id=-1):
        super(FasterDecoder, self).__init__(cpt_dir, cpt_tag=cpt_tag,
                                            device_id=device_id)
        self.function = function
        name = self.conf["nnet"]
        if name in ("asr@att", "asr@enh_att"):
            from aps_tpu.asr.beam_search import att as api
        elif name in ("asr@xfmr", "asr@enh_xfmr"):
            from aps_tpu.asr.beam_search import transformer as api
        elif "transducer" in name:
            from aps_tpu.asr.beam_search import transducer as api
        else:
            api = None
        self.api = api
        self.sos = self.conf["nnet_conf"].get("sos", -1)
        self.eos = self.conf["nnet_conf"].get("eos", -1)
        self.vocab_size = self.conf["nnet_conf"]["vocab_size"]

    def run(self, src, lm=None, **kwargs):
        src = jnp.asarray(src)
        if self.api is None:
            # encoder-only CTC model: prefix beam search; wave padded onto
            # the geometric grid, logits through a cached jitted apply
            from aps_tpu.asr.beam_search.ctc import CtcApi
            from aps_tpu.asr.beam_search.utils import jit_apply
            from aps_tpu.loader.utils import quantize_len
            if src.ndim == 1:  # raw wave: pad samples
                S = src.shape[-1]
                pad = quantize_len(int(S), floor=16000) - int(S)
                src_pad = jnp.pad(src, (0, pad))
                x_len = jnp.asarray([S])
            else:  # precomputed features: pad frames
                S = src.shape[0]
                pad = quantize_len(int(S), floor=100) - int(S)
                src_pad = jnp.pad(src, ((0, pad), (0, 0)))
                x_len = jnp.asarray([S])
            logits, n_frames = jit_apply(self.nnet, self.variables,
                                         src_pad[None], x_len,
                                         method="ctc_logits")
            logits = logits[0, :int(n_frames[0])]
            return CtcApi(self.vocab_size - 1).beam_search(
                logits, sos=self.sos, eos=self.eos, **kwargs)
        if "transducer" in self.conf["nnet"]:
            keep = {k: kwargs[k] for k in
                    ("beam_size", "nbest", "len_norm") if k in kwargs}
            fn = self.api.greedy_search if self.function == \
                "greedy_search" else self.api.beam_search
            return fn(self.nnet, self.variables, src, lm=lm, **keep)
        fn = self.api.greedy_search if self.function == "greedy_search" \
            else self.api.beam_search
        return fn(self.nnet, self.variables, src, lm=lm, sos=self.sos,
                  eos=self.eos, **kwargs)

    def run_batch(self, batch, lm=None, **kwargs):
        """Decode a list of utterances. Uses the vmapped batched search
        when the model family supports it (attention AEDs), otherwise
        falls back to per-utterance compiled searches."""
        if self.api is not None and hasattr(self.api, "beam_search_batch"):
            if "transducer" in self.conf["nnet"]:
                keep = {k: kwargs[k] for k in
                        ("beam_size", "nbest", "len_norm", "pad_to",
                         "lm_weight", "mesh") if k in kwargs}
                return self.api.beam_search_batch(self.nnet, self.variables,
                                                  batch, lm=lm, **keep)
            return self.api.beam_search_batch(self.nnet, self.variables,
                                              batch, lm=lm, sos=self.sos,
                                              eos=self.eos, **kwargs)
        kwargs.pop("pad_to", None)
        kwargs.pop("mesh", None)
        return [self.run(src, lm=lm, **kwargs) for src in batch]


def run(args):
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    decoder = FasterDecoder(args.am, cpt_tag=args.am_tag,
                            function=args.function,
                            device_id=args.device_id)
    if decoder.accept_raw:
        if args.segment:
            src_reader = SegmentAudioReader(args.feats_or_wav_scp,
                                            args.segment, sr=args.sr,
                                            channel=args.channel)
        else:
            src_reader = AudioReader(args.feats_or_wav_scp, sr=args.sr,
                                     channel=args.channel)
    else:
        src_reader = ScriptReader(args.feats_or_wav_scp)

    lm = None
    ngram = None
    if args.lm:
        if Path(args.lm).is_file():
            # n-gram LMs cannot step inside the compiled search loop (the
            # reference's python-loop search queries kenlm per step); the
            # TPU-native equivalent is wide-nbest rescoring: search
            # without fusion, rescore every emitted hypothesis with the
            # ngram, emit the rescored best
            from aps_tpu.asr.lm.ngram import NgramLM
            ngram = NgramLM(args.lm, load_dict(args.dict))
            logger.info(f"Load ngram LM from {args.lm} "
                        f"(nbest-rescoring mode, weight {args.lm_weight})")
        else:
            from aps_tpu.asr.beam_search.lm import lm_adapter
            lm_eval = NnetEvaluator(args.lm, device_id=args.device_id,
                                    cpt_tag=args.lm_tag)
            lm = lm_adapter(lm_eval.nnet, lm_eval.variables,
                            max_len=args.max_len, sos=decoder.sos)
            logger.info(f"Use NN LM weight: {args.lm_weight}")

    processor = TextPostProcessor(args.dict, space=args.space,
                                  show_unk=args.show_unk, spm=args.spm)
    kwargs = {k: getattr(args, k) for k in beam_search_params
              if hasattr(args, k)}
    if getattr(args, "disable_unk", False):
        if not args.dict:
            raise RuntimeError("--disable-unk needs --dict to look up "
                               "the <unk> id")
        from aps_tpu.const import UNK_TOKEN
        kwargs["unk"] = load_dict(args.dict)[UNK_TOKEN]
    stdout_top, top = io_wrapper(args.best, "w")
    if args.dump_nbest:
        stdout_nbest, nbest_fd = io_wrapper(args.dump_nbest, "w")
        nbest_fd.write(f"{args.nbest}\n")
    # establish the device<->host data plane before the RTF timer: the
    # FIRST host fetch of a process stalls for session establishment on
    # a networked device (cmd/separate.py:253 note; ~1 ms on local TPU)
    np.asarray(jnp.zeros((), jnp.float32) + 1.0)
    timer = SimpleTimer()
    tot_utts, tot_dur = 0, 0
    for key, src in src_reader:
        if ngram is not None:
            # search all beam_size hypotheses, rescore with the ngram
            wide = dict(kwargs, nbest=max(args.nbest, args.beam_size))
            nbest_hypos = decoder.run(src, lm=None, **wide)
            for hyp in nbest_hypos:
                hyp["score"] += args.lm_weight * ngram.score(
                    hyp["trans"][1:-1])
            nbest_hypos = sorted(nbest_hypos, key=lambda h: h["score"],
                                 reverse=True)[:args.nbest]
        else:
            nbest_hypos = decoder.run(src, lm=lm, **kwargs)
        nbest = [f"{key}\n"]
        for idx, hyp in enumerate(nbest_hypos):
            # remove sos/eos
            trans = processor.run(hyp["trans"][1:-1])
            score = hyp["score"]
            nbest.append(f"{score:.3f}\t{len(hyp['trans']) - 2:d}\t"
                         f"{trans}\n")
            if idx == 0:
                top.write(f"{key}\t{trans}\n")
        if args.dump_nbest:
            nbest_fd.write("".join(nbest))
        tot_utts += 1
        if decoder.accept_raw:
            tot_dur += len(src) / args.sr
        if tot_utts % 50 == 0:
            top.flush()
            logger.info(f"Processed {tot_utts} utterances...")
    cost = timer.elapsed() * 60
    logger.info(f"Decoded {tot_utts} utterances in {cost:.1f}s"
                + (f", RTF = {cost / tot_dur:.4f}" if tot_dur else ""))
    if not stdout_top:
        top.close()
    if args.dump_nbest and not stdout_nbest:
        nbest_fd.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="ASR decoding with compiled beam search",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[DecodingParser.parser])
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--segment", type=str, default="")
    parser.add_argument("--space", type=str, default="")
    parser.add_argument("--show-unk", type=str, default="<unk>")
    parser.add_argument("--dump-nbest", type=str, default="")
    parser.add_argument("--function", type=str, default="beam_search",
                        choices=["beam_search", "greedy_search"])
    run(parser.parse_args())
