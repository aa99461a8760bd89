#!/usr/bin/env python
"""Fused CTC prefix-scorer step kernel (joint CTC/attention decoding).

One Pallas kernel executes the whole per-step CTC prefix-score update of
aps_tpu/asr/beam_search/ctc.py::CtcScorer.__call__ — the phi terms, BOTH
blocked log-linear gamma recursions, the extension scores and the delta —
with every intermediate VMEM-resident in a flat (T, L) lane layout.

Why: a decode-step trace (BENCHMARKS.md round 3) shows the XLA lowering
of the scorer dominates the whole beam-search step: ~3.4 ms/step of small
logaddexp fusions plus ~1.8 ms/step of reshapes — the T x B x C
intermediates tile their 12-wide minor dim to 128 lanes, so every
T x B x C <-> T x (B*C) reshape is a physical relayout, and each
Hillis-Steele level is a separate HBM round trip. The decoder matmuls are
<7% of the step. Here the host passes flat (T, L) operands (L = B*C,
lane-aligned), the kernel runs the ~40 elementwise/scan passes on VMEM,
and HBM sees each operand once.

Batching: `ctc_score_step` carries a custom_vmap rule that folds the
mapped axis into the lane axis — `beam_search_batch`'s per-utterance vmap
therefore lowers to ONE wide kernel (lane-blocked grid over N*B*C lanes)
instead of N sequential sub-128-lane instances (the vmap lift that made
the first fused attempt perf-neutral, BENCHMARKS.md round 3).

The recursion math mirrors ctc.py::_blocked_log_linear_rec exactly
(32-frame closed-form blocks + carried block boundaries), so the fused
step is numerically the same algorithm, not an approximation.

Parity surface: /root/reference/aps/asr/beam_search/ctc.py (CtcScorer:200,
the eq. 51-53 gamma recursions of the hybrid CTC/attention paper).
"""

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching, lax
from jax.experimental import pallas as pl

from aps_tpu.const import MIN_F32

BLOCK = 32  # frames per closed-form block (matches ctc.py)
# Per grid instance the kernel keeps ~12 live (Tpad, LB) f32 intermediates
# plus the 4 double-buffered (T, LB) inputs and 2 outputs in VMEM
# (~16 MB/core). The lane block is therefore scaled DOWN with T so the
# working set stays inside a conservative budget; below 128 lanes
# (the minimum tile) the fused path is unsupported and CtcScorer falls
# back to the portable XLA scorer.
LANE_BLOCK = 256        # cap (short utterances)
_LIVE_BUFFERS = 16      # conservative live (Tpad, LB) f32 buffer count
# Budget calibrated EMPIRICALLY on the v5e bench chip (2026-08-20,
# ADVICE r04): with the gate bypassed, Tpad=2048 x 128 lanes compiles
# and runs (2.7-3.2 ms/call, flat from T=512), Tpad=3072 x 128 dies in
# the Mosaic compile — so the real wall sits between the 16-buffer
# model's 16.8 MB and 25.2 MB estimates. 16 MiB admits EXACTLY the
# tested envelope — 128-lane blocks to Tpad<=2048 (~80 s utterances at
# 25 fps encoder frames) and 256-lane blocks to Tpad<=1024 — and
# rejects everything beyond it.
_VMEM_BUDGET = 16 * 2**20


def _lane_block(T: int) -> int:
    """Largest multiple-of-128 lane block whose (Tpad, LB) working set
    fits the VMEM budget; 0 if even 128 lanes do not fit."""
    Tpad = -(-T // BLOCK) * BLOCK
    lb = _VMEM_BUDGET // (_LIVE_BUFFERS * Tpad * 4)
    return min(LANE_BLOCK, (lb // 128) * 128)


def fused_supported(T: int) -> bool:
    """True when the fused kernel's VMEM working set fits at T frames."""
    return _lane_block(T) >= 128


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
    is_first = isf_ref[...] > 0  # (1, L) lane mask
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
    pb = pb_ref[...]  # (T, L): per-lane blank column (batch-foldable)
    w_b = _shift_rows(gamma_n, 1, MIN_F32) + pb
    w_b = jnp.concatenate([fill(1, MIN_F32), w_b[1:]], axis=0)
    q = jnp.concatenate([jnp.zeros((1, L), jnp.float32), pb[1:]], axis=0)
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


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _ctc_score_lanes(p_c, gnx, gbx, pb, rok, eosm, old, isf,
                     interpret: bool):
    """pallas_call over a lane-blocked grid; all operands (T, L)/(1, L)."""
    T, L = p_c.shape
    lb_max = _lane_block(T)
    if lb_max < 128:
        raise ValueError(
            f"ctc_score_step: T={T} exceeds the fused kernel's VMEM "
            "budget (see fused_supported); use the portable scorer")
    LB = min(lb_max, _round_up(L, 128))
    Lp = _round_up(L, LB)
    if Lp != L:
        # edge-replicated pad lanes recompute lane L-1: no -inf/-inf NaN
        # hazards in the padding, outputs sliced off below
        pe = lambda x: jnp.pad(x, ((0, 0), (0, Lp - L)), mode="edge")
        p_c, gnx, gbx, pb = pe(p_c), pe(gnx), pe(gbx), pe(pb)
        rok, eosm, old, isf = pe(rok), pe(eosm), pe(old), pe(isf)
    nb = -(-T // BLOCK)
    kfn = functools.partial(_ctc_score_kernel, T=T, nb=nb)
    spec_t = pl.BlockSpec((T, LB), lambda j: (0, j))
    spec_1 = pl.BlockSpec((1, LB), lambda j: (0, j))
    outs = pl.pallas_call(
        kfn,
        grid=(Lp // LB,),
        in_specs=[spec_t, spec_t, spec_t, spec_t,
                  spec_1, spec_1, spec_1, spec_1],
        out_specs=[spec_t, spec_t, spec_1, spec_1],
        out_shape=[
            jax.ShapeDtypeStruct((T, Lp), jnp.float32),
            jax.ShapeDtypeStruct((T, Lp), jnp.float32),
            jax.ShapeDtypeStruct((1, Lp), jnp.float32),
            jax.ShapeDtypeStruct((1, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(p_c, gnx, gbx, pb, rok, eosm, old, isf)
    if Lp != L:
        outs = [o[:, :L] for o in outs]
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _fused_step(interpret: bool):
    """custom_vmap wrapper: a mapped axis folds into the lane axis, so
    the batched search emits ONE wide kernel per step instead of one
    narrow kernel per utterance."""

    @custom_batching.custom_vmap
    def step(p_c, gnx, gbx, pb, rok, eosm, old, isf):
        return _ctc_score_lanes(p_c, gnx, gbx, pb, rok, eosm, old, isf,
                                interpret)

    @step.def_vmap
    def _rule(axis_size, in_batched, *args):
        N = axis_size
        bcast = lambda x, b: x if b else jnp.broadcast_to(
            x[None], (N,) + x.shape)
        p_c, gnx, gbx, pb, rok, eosm, old, isf = (
            bcast(a, b) for a, b in zip(args, in_batched))
        L = p_c.shape[2]
        # (N, R, L) -> (R, N*L): utterance-major lane groups
        flat = lambda x: jnp.moveaxis(x, 0, 1).reshape(
            x.shape[1], N * x.shape[2])
        outs = step(flat(p_c), flat(gnx), flat(gbx), flat(pb),
                    flat(rok), flat(eosm), flat(old), flat(isf))
        unflat = lambda x: jnp.moveaxis(
            x.reshape(x.shape[0], N, L), 1, 0)
        return tuple(unflat(o) for o in outs), (True,) * 4

    return step


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
        p_blank: T x 1 f32 blank log-probs (broadcast over lanes)
        repeat_ok: 1 x L f32 (1.0 where cand != last token of the prefix)
        eos_mask: 1 x L f32 (1.0 where cand == eos)
        old_score: 1 x L f32 prefix scores expanded to cand lanes
        is_first: 1 x 1 f32 (>0 when the prefix is empty, i.e. step 0)
    Returns:
        (gamma_n, gamma_b, score, delta): T x L, T x L, 1 x L, 1 x L
    """
    T, L = p_c.shape
    pb = jnp.broadcast_to(p_blank, (T, L))
    isf = jnp.broadcast_to(
        jnp.asarray(is_first, jnp.float32).reshape(1, 1), (1, L))
    return _fused_step(bool(interpret))(p_c, gamma_nx, gamma_bx, pb,
                                        repeat_ok, eos_mask, old_score,
                                        isf)
