"""A/B: flat batched decode f32 vs bf16, and full-prefix vs incremental."""
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
configs = {
    "f32": dict(),
    "bf16": dict(dtype="bfloat16"),
    "bf16+mmbf16": dict(dtype="bfloat16", matmul_precision="bfloat16"),
}
out = {}
for name, extra in configs.items():
    out[name] = api.beam_search_batch(nnet, variables, utts,
                                      **extra, **kwargs)
for name in ("bf16", "bf16+mmbf16"):
    match = sum(out["f32"][b][0]["trans"] == out[name][b][0]["trans"]
                for b in range(B))
    print(f"{name} transcript parity vs f32: {match}/{B}")
iters = 5
best = {k: 1e9 for k in configs}
for _ in range(3):
    for name, extra in configs.items():
        beg = time.perf_counter()
        for _ in range(iters):
            api.beam_search_batch(nnet, variables, utts, **extra, **kwargs)
        best[name] = min(best[name], time.perf_counter() - beg)
for name in configs:
    print(f"{name}: {B * 8.0 * iters / best[name]:.1f}x RT")
