#!/usr/bin/env python
"""Python real-time transformer enhancement demo (parity:
/root/reference/demos/real_time_enhancement/python/rt_enh_transformer.py):
rolling attention window of (lctx+1) chunks; the mask for the newest frame
is taken from each window (same loop as csrc/enh/transformer.h)."""

import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aps_tpu.eval import NnetEvaluator  # noqa: E402
from aps_tpu.io import read_audio, write_audio  # noqa: E402
from aps_tpu.transform.streaming import (StreamingSTFT,  # noqa: E402
                                         StreamingiSTFT)


def run(args):
    evaluator = NnetEvaluator(args.checkpoint, cpt_tag=args.tag)
    conf = evaluator.conf
    enh = conf["enh_transform"]
    frame_len, frame_hop = enh["frame_len"], enh["frame_hop"]
    window = enh.get("window", "sqrthann")
    nnet_conf = conf["nnet_conf"]
    chunk = nnet_conf.get("chunk", 1)
    lctx = nnet_conf.get("lctx", 3) * chunk
    complex_mask = nnet_conf.get("complex_mask", True)

    stft = StreamingSTFT(frame_len, frame_hop, window=window)
    istft = StreamingiSTFT(frame_len, frame_hop, window=window)
    win_length = stft.win_length

    jit_mask = jax.jit(lambda v, feats: evaluator.nnet.apply(
        v, feats, method="mask_predict"))
    mask_fn = lambda feats: jit_mask(evaluator.variables, feats)

    sr = args.sr
    mix = read_audio(args.noisy, sr=sr)
    total = mix.shape[-1]
    frames = []
    for start in range(0, total - win_length + 1, frame_hop):
        frames.append(mix[start:start + win_length])

    start_time = time.time()
    specs, feats = [], []
    for frame in frames:
        spec = stft.step(jnp.asarray(frame)[None])[0]
        specs.append(spec)
        mag = jnp.abs(spec[..., 0] + 1j * spec[..., 1])
        feats.append(jnp.log(jnp.maximum(mag, 1.19e-7)))

    out, state = [], istft.init_state(1)
    for t in range(len(frames)):
        # causal rolling window: frames [t - lctx, t], first frame
        # replicated at the start of the stream
        ctx = [feats[max(0, t - lctx + i)] for i in range(lctx + 1)]
        block = jnp.stack(ctx)[None]  # 1 x (lctx+1) x F
        mask = np.asarray(mask_fn(block))[0]  # W x F (x 2)
        m = mask[-1]  # newest frame
        spec = specs[t]
        if complex_mask:
            mr, mi = m[..., 0], m[..., 1]
            masked = jnp.stack([
                spec[..., 0] * mr - spec[..., 1] * mi,
                spec[..., 0] * mi + spec[..., 1] * mr
            ], -1)
        else:
            masked = spec * m[..., None]
        state, hop = istft.step(state, masked[None])
        out.append(np.asarray(hop[0]))
    tail = istft.flush(state)
    out.append(np.asarray(tail[0]))
    enhanced = np.concatenate(out)
    cost = time.time() - start_time
    write_audio(args.enhan, enhanced, sr=sr)
    dur = total / sr
    print(f"Processed {dur:.2f}s audio in {cost:.2f}s, "
          f"RTF = {cost / dur:.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="python real-time transformer enhancement")
    parser.add_argument("noisy", help="input noisy wav")
    parser.add_argument("enhan", help="output enhanced wav")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--tag", default="best")
    parser.add_argument("--sr", type=int, default=16000)
    run(parser.parse_args())
