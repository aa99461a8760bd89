"""Flash vs dense attention in the 256<=T<768 regime (VERDICT r03 #9):
B=32,H=4,D=64 fwd+bwd bf16, block sizes {128,256} vs the dense einsum.

NOTE the warm-up must force a HOST fetch (np.asarray), not just
block_until_ready: on the networked-device runtime the first
block_until_ready can return before the remote program is resident,
and every later timing then reads ~0 ms (observed: a 4.3 ms step
"measured" at 0.02 ms)."""
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from aps_tpu.ops.pallas.attention import flash_attention, mha_reference
from aps_tpu.utils import enable_compilation_cache

enable_compilation_cache()
B, H, D = 32, 4, 64


def bench(fn, *args):
    loss = jax.jit(jax.grad(lambda q, k, v: fn(q, k, v).sum()))
    np.asarray(loss(*args))  # force compile + remote residency
    best = 1e9
    for _ in range(3):
        beg = time.perf_counter()
        g = None
        for _ in range(10):
            g = loss(*args)
        jax.block_until_ready(g)
        best = min(best, time.perf_counter() - beg)
    return best / 10 * 1e3


for T in (256, 384, 512, 640, 768, 1024):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, D),
                          dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, D),
                          dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, D),
                          dtype=jnp.bfloat16)
    rows = [f"dense {bench(mha_reference, q, k, v):.2f}"]
    for blk in (128, 256):
        if blk > T:
            continue
        fn = lambda q, k, v: flash_attention(q, k, v, block_q=blk,
                                             block_k=blk, force=True)
        rows.append(f"flash{blk} {bench(fn, q, k, v):.2f}")
    print(f"T={T}: " + "  ".join(rows) + " ms", flush=True)
