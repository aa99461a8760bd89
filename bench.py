#!/usr/bin/env python
"""Benchmark entry. Prints ONE JSON line {"metric","value","unit",
"vs_baseline"}.

Default metric (the BASELINE.md north star): batched beam-search decoding
throughput of the flagship full-size Conformer AED on one chip — audio
seconds decoded per wall-clock second (real-time factor), beam 8 with CTC
fusion 0.4, batch 64 of 8 s utterances. vs_baseline is vs 1x real time
(the reference publishes no RTF numbers; its decode loop is per-utterance).

`python bench.py --metric train` reports the training-step RTF instead
(see BENCHMARKS.md for the recorded numbers of both)."""

import argparse
import json
import time


def bench_decode(on_tpu: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aps_tpu.asr.beam_search import transformer as api

    V = 4233 if on_tpu else 64
    nnet = _build_flagship(vocab_size=V, small=not on_tpu)
    rng = np.random.default_rng(0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2), "ss": jax.random.PRNGKey(3)}
    secs = 8.0 if on_tpu else 1.0
    S = int(16000 * secs)
    x0 = jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
    variables = nnet.init(rngs, x0[None], None,
                          jnp.zeros((1, 8), dtype=jnp.int32), None,
                          training=False)
    B = 64 if on_tpu else 2
    utts = [jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
            for _ in range(B)]
    kwargs = dict(sos=V - 3, eos=V - 2, beam_size=8, nbest=1,
                  max_len=40 if on_tpu else 8, ctc_weight=0.4,
                  ctc_beam_size=12)
    # compile
    api.beam_search_batch(nnet, variables, utts, **kwargs)
    iters = 5 if on_tpu else 2
    # the chip may be time-shared: take the best of 3 measurements
    best = float("inf")
    for _ in range(3 if on_tpu else 1):
        beg = time.perf_counter()
        for _ in range(iters):
            out = api.beam_search_batch(nnet, variables, utts, **kwargs)
        best = min(best, time.perf_counter() - beg)
    del out
    rtf = B * secs * iters / best
    return {
        "metric": "conformer_aed_batched_decode_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        "vs_baseline": round(rtf / 1.0, 2),
    }


def bench_train(on_tpu: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from aps_tpu.libs import aps_task

    V = 4233 if on_tpu else 64
    nnet = _build_flagship(vocab_size=V, small=not on_tpu)
    task = aps_task("asr@ctc_xent", nnet, ctc_weight=0.2, blank=V - 1,
                    lsm_factor=0.1)
    N = 32 if on_tpu else 2
    secs = 8.0
    S = int(16000 * secs)
    To = 24 if on_tpu else 8
    rng = jax.random.PRNGKey(0)
    egs = {
        "src_pad": jax.random.normal(rng, (N, S)) * 0.1,
        "src_len": jnp.full((N,), S),
        "tgt_pad": jnp.zeros((N, To), dtype=jnp.int32),
        "tgt_len": jnp.full((N,), To),
    }
    rngs = {"params": rng, "dropout": rng, "aug": rng, "ss": rng}
    variables = task.init(rngs, egs, training=True)
    params = variables["params"]
    mstate = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, mstate, opt_state, egs, rng):
        def loss_fn(p):
            out, new_mstate = task.apply(
                {"params": p, **mstate}, egs, training=True,
                rngs={"dropout": rng, "aug": rng, "ss": rng},
                mutable=list(mstate.keys()))
            return out["loss"], new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_mstate, opt_state, loss

    params, mstate, opt_state, loss = step(params, mstate, opt_state, egs,
                                           rng)
    jax.block_until_ready(loss)
    iters = 10 if on_tpu else 3
    beg = time.perf_counter()
    for i in range(iters):
        params, mstate, opt_state, loss = step(params, mstate, opt_state,
                                               egs, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    wall = time.perf_counter() - beg
    rtf = N * secs * iters / wall
    return {
        "metric": "conformer_aed_train_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        "vs_baseline": round(rtf / 1.0, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", default="decode",
                        choices=["decode", "train"])
    args = parser.parse_args()
    import jax
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    result = bench_decode(on_tpu) if args.metric == "decode" else \
        bench_train(on_tpu)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
