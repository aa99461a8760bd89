#!/usr/bin/env python
"""Streaming CTC ASR demo: feed a wav chunk by chunk through a
streaming_asr@ctc model (feature frames -> context window -> encoder step
-> incremental CTC greedy decode) and print partial hypotheses as they
stabilize. Demonstrates the streaming deployment path for ASR — the
reference ships streaming demos for enhancement only."""

import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aps_tpu.eval import NnetEvaluator, TextPostProcessor  # noqa: E402
from aps_tpu.io import read_audio  # noqa: E402


def run(args):
    evaluator = NnetEvaluator(args.checkpoint, cpt_tag=args.tag)
    conf = evaluator.conf
    nnet_conf = conf["nnet_conf"]
    lctx = max(nnet_conf.get("lctx", 0), 0)
    rctx = max(nnet_conf.get("rctx", 0), 0)
    blank = nnet_conf["vocab_size"] - 1
    processor = TextPostProcessor(args.dict) if args.dict else None

    # feature pipeline runs offline per chunk of raw audio; the encoder
    # steps over (lctx + chunk + rctx) feature windows
    tf_conf = conf["asr_transform"]
    from aps_tpu.libs import aps_transform
    transform = aps_transform("asr")(**tf_conf)
    tf_vars = {}

    wav = read_audio(args.wav, sr=args.sr)
    feats, _ = transform.apply(tf_vars, jnp.asarray(wav)[None], None,
                               rngs={"aug": jax.random.PRNGKey(0)})
    feats = feats[0]  # T x F
    T = feats.shape[0]
    # zero-pad the model context like the offline path (_pad_ctx), so the
    # streamed logits equal the offline ctc_logits frame for frame
    feats = jnp.pad(feats, ((lctx, rctx), (0, 0)))

    jit_step = jax.jit(lambda v, block, state: evaluator.nnet.apply(
        v, block, state, method="step"))
    step_fn = lambda block, state: jit_step(evaluator.variables, block,
                                            state)

    state = None
    prev_tok = blank
    hyp = []
    chunk = args.chunk_frames
    t0 = time.time()
    for beg in range(0, T, chunk):
        width = min(chunk, T - beg)
        block = feats[None, beg:beg + width + lctx + rctx]
        logits, state = step_fn(block, state)
        toks = np.asarray(jnp.argmax(logits[0], -1))
        for tok in toks:
            if tok != blank and tok != prev_tok:
                hyp.append(int(tok))
            prev_tok = int(tok)
        if processor is not None:
            print(f"[{beg:5d}] {processor.run(hyp)}", flush=True)
        else:
            print(f"[{beg:5d}] {hyp}", flush=True)
    dur = wav.shape[-1] / args.sr
    cost = time.time() - t0
    print(f"Streamed {dur:.2f}s audio in {cost:.2f}s "
          f"(RTF = {cost / dur:.4f})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="streaming CTC ASR demo")
    parser.add_argument("wav")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--dict", default="")
    parser.add_argument("--tag", default="best")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--chunk-frames", type=int, default=16)
    run(parser.parse_args())
