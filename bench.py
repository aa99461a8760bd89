#!/usr/bin/env python
"""Benchmark: flagship Conformer-AED training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric = audio seconds processed per wall-clock second during training
(train-side real-time factor). vs_baseline is vs 1x real-time (the
reference publishes no throughput numbers — see BASELINE.md)."""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from aps_tpu.libs import aps_task

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    # full-size model on accelerator hardware; small on CPU fallback
    nnet = _build_flagship(vocab_size=4233 if on_tpu else 64,
                           small=not on_tpu)
    task = aps_task("asr@ctc_xent", nnet, ctc_weight=0.2,
                    blank=(4233 if on_tpu else 64) - 1, lsm_factor=0.1)

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

    # warmup/compile
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

    audio_sec = N * secs * iters
    rtf = audio_sec / wall
    print(json.dumps({
        "metric": "conformer_aed_train_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        "vs_baseline": round(rtf / 1.0, 2),
    }))


if __name__ == "__main__":
    main()
