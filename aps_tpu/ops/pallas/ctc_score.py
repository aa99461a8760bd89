#!/usr/bin/env python
"""Fused CTC prefix-scorer step kernel (joint CTC/attention decoding).

One Pallas kernel executes the whole per-step CTC prefix-score update of
aps_tpu/asr/beam_search/ctc.py::CtcScorer.__call__ — the phi terms, BOTH
blocked log-linear gamma recursions, the extension scores and the delta —
with every intermediate VMEM-resident in a flat (T, B*C) layout.

Why: a decode-step trace (BENCHMARKS.md round 3) shows the XLA lowering
of the scorer dominates the whole beam-search step: ~3.4 ms/step of small
logaddexp fusions plus ~1.8 ms/step of reshapes — the T x B x C
intermediates tile their 12-wide minor dim to 128 lanes, so every
T x B x C <-> T x (B*C) reshape is a physical relayout, and each
Hillis-Steele level is a separate HBM round trip. The decoder matmuls are
<7% of the step. Here the host passes flat (T, L) operands (L = B*C,
lane-aligned), the kernel runs the ~40 elementwise/scan passes on VMEM,
and HBM sees each operand once.

The recursion math mirrors ctc.py::_blocked_log_linear_rec exactly
(32-frame closed-form blocks + carried block boundaries), so the fused
step is numerically the same algorithm, not an approximation.

Parity surface: /root/reference/aps/asr/beam_search/ctc.py (CtcScorer:200,
the eq. 51-53 gamma recursions of the hybrid CTC/attention paper).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from aps_tpu.const import MIN_F32

BLOCK = 32  # frames per closed-form block (matches ctc.py)


def _shift_rows(x, s, fill):
    """Row t <- x[t - s] (global shift along axis 0), rows < s = fill."""
    if s == 0:
        return x
    return jnp.concatenate(
        [jnp.full((s, x.shape[1]), fill, x.dtype), x[:-s]], axis=0)


def _blocked_shift(x, s, fill, tmod):
    """Within-block shift: row t <- x[t-s] where (t % BLOCK) >= s."""
    return jnp.where(tmod >= s, _shift_rows(x, s, fill), fill)


def _blocked_rec(w, p, tmod, nb):
    """x_t = logaddexp(x_{t-1} + p_t, w_t), x_{-1} = -inf, along axis 0
    of (nb*BLOCK, L) arrays — same blocked scheme as ctc.py:
    within-block closed form x_t = P_t + logcumsumexp_{s<=t}(w_s - P_s)
    via masked Hillis-Steele levels, then a short carried loop over the
    nb block boundaries."""
    # within-block inclusive cumsum of p
    P = p
    s = 1
    while s < BLOCK:
        P = P + _blocked_shift(P, s, 0.0, tmod)
        s *= 2
    S = jnp.maximum(w - P, MIN_F32)
    s = 1
    while s < BLOCK:  # within-block inclusive logcumsumexp
        S = jnp.logaddexp(S, _blocked_shift(S, s, MIN_F32, tmod))
        s *= 2
    # carry x across block boundaries (nb static slices of BLOCK rows)
    parts = []
    carry = jnp.full((1, w.shape[1]), MIN_F32)
    for b in range(nb):
        lo = b * BLOCK
        x_b = jnp.maximum(
            P[lo:lo + BLOCK] + jnp.logaddexp(S[lo:lo + BLOCK], carry),
            MIN_F32)
        parts.append(x_b)
        carry = x_b[BLOCK - 1:BLOCK]
    return jnp.concatenate(parts, axis=0)


def _ctc_score_kernel(pc_ref, gnx_ref, gbx_ref, pb_ref, rok_ref, eosm_ref,
                      score_ref, isf_ref, gn_out, gb_out, sc_out, dl_out,
                      *, T: int, nb: int):
    L = pc_ref.shape[1]
    Tpad = nb * BLOCK
    fill = lambda r, v: jnp.full((r, L), v, jnp.float32)
    pad = Tpad - T
    rpad = lambda x, v: x if pad == 0 else jnp.concatenate(
        [x, fill(pad, v)], axis=0)
    pc = pc_ref[...]
    is_first = isf_ref[0, 0] > 0
    # phi_t = logaddexp(gamma_b[t], [no-repeat] gamma_n[t])
    term = jnp.where(rok_ref[...] > 0, gnx_ref[...], MIN_F32)
    phi = jnp.logaddexp(gbx_ref[...], term)
    # a_0 = p_c[0] (empty prefix) else -inf; a_t = phi_{t-1} + p_c[t]
    a = _shift_rows(phi, 1, MIN_F32) + pc
    a0 = jnp.where(is_first, pc[0:1], fill(1, MIN_F32))
    a = jnp.concatenate([a0, a[1:]], axis=0)
    tmod = lax.broadcasted_iota(jnp.int32, (Tpad, 1), 0) % BLOCK
    gamma_n = _blocked_rec(rpad(a, MIN_F32), rpad(pc, 0.0), tmod, nb)[:T]
    # w_b0 = -inf; w_bt = gamma_n_{t-1} + p_blank_t;  q_0 = 0, q_t = pb_t
    pb = pb_ref[...]  # (T, 1) broadcasts over lanes
    w_b = _shift_rows(gamma_n, 1, MIN_F32) + pb
    w_b = jnp.concatenate([fill(1, MIN_F32), w_b[1:]], axis=0)
    q = jnp.concatenate([jnp.zeros((1, 1), jnp.float32), pb[1:]], axis=0)
    q = jnp.broadcast_to(q, (T, L))
    gamma_b = _blocked_rec(rpad(w_b, MIN_F32), rpad(q, 0.0), tmod, nb)[:T]
    # extension score = logsumexp_t a_t; eos: full-prefix probability
    m = jnp.max(a, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(a - m), axis=0, keepdims=True))
    score = jnp.maximum(lse, MIN_F32)
    full_prefix = jnp.logaddexp(gbx_ref[T - 1:T], gnx_ref[T - 1:T])
    score = jnp.where(eosm_ref[...] > 0, full_prefix, score)
    gn_out[...] = gamma_n
    gb_out[...] = gamma_b
    sc_out[...] = score
    dl_out[...] = score - score_ref[...]


def ctc_score_step(p_c: jnp.ndarray,
                   gamma_nx: jnp.ndarray,
                   gamma_bx: jnp.ndarray,
                   p_blank: jnp.ndarray,
                   repeat_ok: jnp.ndarray,
                   eos_mask: jnp.ndarray,
                   old_score: jnp.ndarray,
                   is_first: jnp.ndarray,
                   interpret: bool = False):
    """Fused CTC prefix-scorer step over flat (T, L) operands, L = B*C.

    Args:
        p_c: T x L f32 log p(t, cand) (pre-gathered, flat candidate axis)
        gamma_nx / gamma_bx: T x L f32 prefix gammas expanded to cand lanes
        p_blank: T x 1 f32 blank log-probs
        repeat_ok: 1 x L f32 (1.0 where cand != last token of the prefix)
        eos_mask: 1 x L f32 (1.0 where cand == eos)
        old_score: 1 x L f32 prefix scores expanded to cand lanes
        is_first: 1 x 1 f32 (>0 when the prefix is empty, i.e. step 0)
    Returns:
        (gamma_n, gamma_b, score, delta): T x L, T x L, 1 x L, 1 x L
    """
    T, L = p_c.shape
    nb = -(-T // BLOCK)
    kfn = functools.partial(_ctc_score_kernel, T=T, nb=nb)
    full = lambda r: pl.BlockSpec((r, L), lambda: (0, 0))
    return pl.pallas_call(
        kfn,
        in_specs=[full(T), full(T), full(T),
                  pl.BlockSpec((T, 1), lambda: (0, 0)),
                  full(1), full(1), full(1),
                  pl.BlockSpec((1, 1), lambda: (0, 0))],
        out_specs=[full(T), full(T), full(1), full(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, L), jnp.float32),
            jax.ShapeDtypeStruct((T, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.float32),
        ],
        interpret=interpret,
    )(p_c, gamma_nx, gamma_bx, p_blank, repeat_ok, eos_mask, old_score,
      is_first)
