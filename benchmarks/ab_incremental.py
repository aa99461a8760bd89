"""A/B: full-prefix rescore vs incremental decode in the flat search."""
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_flagship
from aps_tpu.asr.beam_search import transformer as api
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
kwargs = dict(sos=V - 3, eos=V - 2, beam_size=8, nbest=1, max_len=40,
              ctc_weight=0.4, ctc_beam_size=12, approx_topk=True,
              allow_partial=True)
out = {}
for inc in (False, True):
    api.INC_CROSSOVER = 0 if inc else 128
    api._BATCH_EXECUTABLES._entries.clear()
    out[inc] = api.beam_search_batch(nnet, variables, utts, **kwargs)
match = sum(out[False][b][0]["trans"] == out[True][b][0]["trans"]
            for b in range(B))
print(f"transcript parity full vs inc: {match}/{B}")
iters = 5
best = {False: 1e9, True: 1e9}
fns = {}
for inc in (False, True):
    api.INC_CROSSOVER = 0 if inc else 128
    api._BATCH_EXECUTABLES._entries.clear()
    api.beam_search_batch(nnet, variables, utts, **kwargs)  # compile
    # snapshot the executable for this mode
    fns[inc] = dict(api._BATCH_EXECUTABLES._entries)
for _ in range(3):
    for inc in (False, True):
        api._BATCH_EXECUTABLES._entries.clear()
        api._BATCH_EXECUTABLES._entries.update(fns[inc])
        api.INC_CROSSOVER = 0 if inc else 128
        beg = time.perf_counter()
        for _ in range(iters):
            api.beam_search_batch(nnet, variables, utts, **kwargs)
        best[inc] = min(best[inc], time.perf_counter() - beg)
for inc in (False, True):
    print(f"inc={inc}: {B * 8.0 * iters / best[inc]:.1f}x RT")
