"""Partition batched-decode time: encoder pass vs search loop vs CTC
scorer vs decoder, by ablating pieces on the bench config."""
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_flagship
from aps_tpu.asr.beam_search import transformer as api
from aps_tpu.asr.beam_search.utils import jit_apply, stack_padded
from aps_tpu.utils import enable_compilation_cache

enable_compilation_cache()

V = 4233
nnet = _build_flagship(vocab_size=V, small=False)
rng = np.random.default_rng(0)
rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "aug": jax.random.PRNGKey(2), "ss": jax.random.PRNGKey(3)}
S = int(16000 * 8.0)
x0 = jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
variables = nnet.init(rngs, x0[None], None,
                      jnp.zeros((1, 8), dtype=jnp.int32), None,
                      training=False)
B = 64
utts = [jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
        for _ in range(B)]
base = dict(sos=V - 3, eos=V - 2, beam_size=8, nbest=1, max_len=40,
            approx_topk=True, allow_partial=True)
configs = {
    "full(ctc0.4)": dict(ctc_weight=0.4, ctc_beam_size=12),
    "no_ctc": dict(),
    "beam2(ctc0.4)": dict(ctc_weight=0.4, ctc_beam_size=12, beam_size=2),
    "maxlen20(ctc0.4)": dict(ctc_weight=0.4, ctc_beam_size=12, max_len=20),
}


def encoder_only():
    x_pad, lens, _ = stack_padded(utts)
    out = jit_apply(nnet, variables, x_pad, jnp.asarray(lens),
                    method="decode_enc")
    jax.block_until_ready(out)


for name, extra in configs.items():
    api.beam_search_batch(nnet, variables, utts, **{**base, **extra})
encoder_only()
iters = 5
best = {k: 1e9 for k in configs}
best_enc = 1e9
for _ in range(3):
    for name, extra in configs.items():
        beg = time.perf_counter()
        for _ in range(iters):
            api.beam_search_batch(nnet, variables, utts,
                                  **{**base, **extra})
        best[name] = min(best[name], time.perf_counter() - beg)
    beg = time.perf_counter()
    for _ in range(iters):
        encoder_only()
    best_enc = min(best_enc, time.perf_counter() - beg)
print(f"encoder_only: {best_enc / iters * 1e3:.1f} ms/batch")
for name in configs:
    ms = best[name] / iters * 1e3
    print(f"{name}: {ms:.1f} ms/batch ({B * 8.0 * iters / best[name]:.0f}x RT)")
