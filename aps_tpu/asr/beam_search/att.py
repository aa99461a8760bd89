#!/usr/bin/env python
"""Vectorized beam search for attention-based AMs (RNN decoder).

Parity surface: /root/reference/aps/asr/beam_search/att.py (greedy_search:21,
decoder_rescore:71, beam_search:117, beam_search_batch:224).

TPU design: the whole search is ONE compiled lax.while_loop — the beam lives
on the batch axis (K hypotheses), every step runs decoder + attention + LM +
CTC-prefix scorer + topk on device with fixed shapes; the host only receives
the final dense beam and formats the nbest list. This is where the >=10x
batched-decode RTF target is won (no per-step host sync)."""

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aps_tpu.asr.beam_search.ctc import CtcScorer
from aps_tpu.asr.beam_search.lm import LmAdapter
from aps_tpu.asr.beam_search.utils import (BeamSearchParam, BeamState,
                                           ExecutableCache, jit_apply,
                                           apply_eos_threshold, disable_unk,
                                           extract_nbest, init_beam_state,
                                           mask_finished_scores,
                                           pad_enc_frames, stack_padded,
                                           topk_candidates)
from aps_tpu.const import MIN_F32


def _param_from_kwargs(sos, eos, **kwargs) -> BeamSearchParam:
    fields = BeamSearchParam.__dataclass_fields__
    clean = {k: v for k, v in kwargs.items() if k in fields}
    return BeamSearchParam(sos=sos, eos=eos, **clean)


def _gather_tree(tree, idx):
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def beam_search(nnet,
                variables,
                x: jnp.ndarray,
                lm: Optional[LmAdapter] = None,
                sos: int = -1,
                eos: int = -1,
                beam_size: int = 8,
                nbest: int = 1,
                max_len: int = -1,
                **kwargs) -> List[Dict]:
    """Single-utterance vectorized beam search.
    x: S (wave) or Ti x F (feature)."""
    param = _param_from_kwargs(sos, eos, beam_size=beam_size, **kwargs)
    enc_out, enc_len, ctc_out = jit_apply(nnet, variables, x[None],
                                          method="decode_enc")
    T = enc_out.shape[1]
    if max_len <= 0:
        max_len = min(param.max_len, T)
    max_len = min(max_len, param.max_len)
    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    enc_pad, ctc_pad, T, Tq = pad_enc_frames(
        enc_out[0], ctc_out[0] if use_ctc else None)
    key = (id(nnet), id(lm), tuple(sorted(vars(param).items())), max_len,
           Tq, enc_pad.shape[-1], use_ctc)

    def _build():
        def _run(variables, enc, el, ctc):
            return _search_core(nnet, variables, enc, el, ctc, lm, param,
                                max_len)

        return jax.jit(_run)

    step = _SINGLE_EXECUTABLES.get(key, _build)
    final_state = step(variables, enc_pad, jnp.asarray(T), ctc_pad)
    return extract_nbest(jax.device_get(final_state), param, nbest,
                         final=True)


def greedy_search(nnet, variables, x, sos=-1, eos=-1, **kwargs) -> List[Dict]:
    kwargs.pop("beam_size", None)
    kwargs.pop("nbest", None)
    return beam_search(nnet, variables, x, sos=sos, eos=eos, beam_size=1,
                       nbest=1, **kwargs)


def segmented_topk(total: jnp.ndarray, cand: Optional[jnp.ndarray],
                   num_utts: int, K: int):
    """Per-utterance top-K beam selection over flat lanes.
    total: (N*K, C) fused scores; cand: (N*K, C) candidate token ids (or
    None -> token id = column index). Returns (score, beam_idx, tok), all
    flat (N*K,) with GLOBAL lane indices, plus flat (N*K,) indices into
    the per-utterance (K*C) candidate axis for scorer-state gathers."""
    N = num_utts
    C = total.shape[-1]
    score_u, idx_u = jax.lax.top_k(total.reshape(N, K * C), K)  # N x K
    base = jnp.arange(N, dtype=idx_u.dtype)[:, None]
    beam_idx = (base * K + idx_u // C).reshape(-1)
    if cand is None:
        tok = (idx_u % C).reshape(-1)
    else:
        tok = jnp.take_along_axis(cand.reshape(N, K * C), idx_u,
                                  axis=1).reshape(-1)
    flat_idx = (base * (K * C) + idx_u).reshape(-1)
    return score_u.reshape(-1), beam_idx, tok, flat_idx


def _per_utt(x: jnp.ndarray, num_utts: int, reduce) -> jnp.ndarray:
    """Reduce a flat (N*K,) lane vector per utterance -> (N,)."""
    return reduce(x.reshape(num_utts, -1), axis=1)


def _search_core(nnet, variables, enc_out, enc_len, ctc_out, lm,
                 param: BeamSearchParam, max_len: int) -> BeamState:
    """The traced search program -> final dense BeamState over flat lanes.

    enc_out is T x D (single utterance) or N x T x D (batch): the beam
    lives on ONE flat lane axis of N*K rows (lane u*K + k = beam k of
    utterance u), so every per-step op — decoder, scorers, bookkeeping —
    spans the whole batch in single fused XLA/Pallas kernels. The
    previous per-utterance vmap synthesized the batch axis instead,
    which serialized pallas_calls into per-utterance grids and left
    8/12-wide minor dims on every beam op (BENCHMARKS.md round 3)."""
    K = param.beam_size
    if enc_out.ndim == 2:
        enc_out = enc_out[None]
        if ctc_out is not None:
            ctc_out = ctc_out[None]
        if enc_len is not None:
            enc_len = jnp.reshape(enc_len, (1,))
    N, T = enc_out.shape[0], enc_out.shape[1]
    lanes = N * K
    enc_tiled = jnp.repeat(enc_out, K, axis=0)  # lanes x T x D
    enc_len_tiled = None if enc_len is None else jnp.repeat(enc_len, K)

    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    scorer = CtcScorer(ctc_out, eos=param.eos, beam_size=K,
                       use_pallas=param.ctc_fused,
                       interpret=jax.default_backend() != "tpu") \
        if use_ctc else None

    carry0, att_cache = nnet.apply(variables, enc_tiled, lanes,
                                   enc_len_tiled, method="decode_prep")
    state0 = init_beam_state(K, max_len, param.sos, T, num_utts=N)
    lm_state0 = lm.init_state(lanes) if lm is not None else None
    ctc_state0 = scorer.init_state() if use_ctc else None

    def dec_step(tok, carry):
        return nnet.apply(variables, tok, enc_tiled, carry, att_cache,
                          enc_len_tiled, method="decode_step")

    # espnet-style end detection: once a finished hypothesis exists
    # and no better one has finished for END_PATIENCE steps, stop early.
    # best_done/last_improve are tracked per utterance (N,)
    END_PATIENCE = 3

    def _go(t, state, best_done, last_improve):
        """Per-utterance continue mask (N,)."""
        go = ~_per_utt(state.done, N, jnp.all)
        if param.end_detect:
            stalled = (best_done > MIN_F32 / 2) & \
                (t - last_improve >= END_PATIENCE)
            go = go & ~stalled
        return go

    def cond(loop):
        t, state, *_rest, best_done, last_improve = loop
        return (t < max_len) & jnp.any(_go(t, state, best_done,
                                           last_improve))

    def body(loop):
        t, state, carry, lm_state, ctc_state, best_done, last_improve = loop
        tok_prev = state.tokens[:, t]
        pred, carry = dec_step(tok_prev, carry)
        am_prob = jax.nn.log_softmax(pred / param.temperature, -1)
        V = am_prob.shape[-1]
        if lm is not None:
            lm_prob, lm_state = lm.step(lm_state, tok_prev, t)
        else:
            lm_prob = 0.0

        if use_ctc:
            C = min(param.ctc_beam_size, V)
            # mask <unk> BEFORE pruning so --disable-unk also holds
            # under joint CTC/attention scoring
            att_score, cand = topk_candidates(
                disable_unk(am_prob, param.unk), C, param.approx_topk)
            # force candidate slot 0 of finished beams to be eos
            cand = jnp.where(state.done[:, None],
                             jnp.full_like(cand, param.eos), cand)
            delta, ctc_state_x = scorer(ctc_state, tok_prev, cand, t == 0)
            fusion = att_score * (1 - param.ctc_weight) + \
                delta * param.ctc_weight
            if lm is not None:
                fusion = fusion + param.lm_weight * jnp.take_along_axis(
                    lm_prob, cand, -1)
            fusion = jnp.where(
                state.done[:, None],
                jnp.where(jnp.arange(C)[None, :] == 0, 0.0, MIN_F32),
                fusion)
            total = state.score[:, None] + fusion
            flat_score, beam_idx, tok, flat_idx = segmented_topk(
                total, cand, N, K)
            ctc_state = scorer.update_var(ctc_state_x, flat_idx)
        else:
            fusion = am_prob + param.lm_weight * lm_prob
            fusion = disable_unk(fusion, param.unk)
            fusion = apply_eos_threshold(fusion, param.eos,
                                         param.eos_threshold)
            fusion = mask_finished_scores(fusion, state.done, param.eos)
            total = state.score[:, None] + fusion
            flat_score, beam_idx, tok, _ = segmented_topk(
                total, None, N, K)

        prev_done = state.done[beam_idx]
        tokens = state.tokens[beam_idx]
        tokens = tokens.at[:, t + 1].set(
            jnp.where(prev_done, tokens[:, t + 1], tok))
        length = state.length[beam_idx] + (~prev_done).astype(jnp.int32)
        done = prev_done | (tok == param.eos)
        # coverage accumulation from attention alignment (carry[2])
        ali = carry[2]
        if ali is not None and ali.ndim == 3:
            ali = jnp.mean(ali, axis=1)
        coverage = state.coverage[beam_idx]
        if ali is not None and param.cov_penalty > 0:
            coverage = coverage + jnp.where(prev_done[:, None], 0.0, ali)
        new_state = BeamState(tokens=tokens, score=flat_score, done=done,
                              length=length, coverage=coverage)
        new_carry = _gather_tree(carry, beam_idx)
        if lm is not None:
            lm_state = lm.reorder(lm_state, beam_idx)
        cur_best = _per_utt(jnp.where(done, flat_score, MIN_F32), N,
                            jnp.max)
        improved = cur_best > best_done
        if param.end_detect and N > 1:
            # freeze utterances whose per-utterance cond is already false
            # (all-done utterances are frozen by done-semantics anyway,
            # but a STALLED utterance still has live beams — exactly the
            # states vmap's while_loop batching would mask out)
            act = _go(t, state, best_done, last_improve)
            sel0 = lambda n, o: jnp.where(
                jnp.repeat(act, K).reshape((lanes,) + (1,) * (n.ndim - 1)),
                n, o)
            new_state = jax.tree_util.tree_map(sel0, new_state, state)
            new_carry = jax.tree_util.tree_map(sel0, new_carry, loop[2])
            if lm is not None:
                lm_state = jax.tree_util.tree_map(sel0, lm_state, loop[3])
            if use_ctc:
                # gammas carry lanes on axis 1
                sel1 = lambda n, o: jnp.where(
                    jnp.repeat(act, K)[None, :], n, o)
                old_ctc = loop[4]
                ctc_state = type(ctc_state)(
                    sel1(ctc_state.gamma_n, old_ctc.gamma_n),
                    sel1(ctc_state.gamma_b, old_ctc.gamma_b),
                    sel0(ctc_state.score, old_ctc.score))
            improved = improved & act
        best_done = jnp.where(improved, jnp.maximum(best_done, cur_best),
                              best_done)
        last_improve = jnp.where(improved, t, last_improve)
        return (t + 1, new_state, new_carry, lm_state, ctc_state,
                best_done, last_improve)

    # lax.while_loop needs uniform pytrees; wrap None states as empty tuples
    loop0 = (0, state0, carry0, lm_state0, ctc_state0,
             jnp.full((N,), MIN_F32, jnp.float32),
             jnp.zeros((N,), jnp.int32))
    _, final_state, *_ = jax.lax.while_loop(cond, body, loop0)
    return final_state


# jitted batched-search executables, keyed by (model, search knobs, shapes)
_BATCH_EXECUTABLES = ExecutableCache(maxsize=32)
# single-utterance searches, one executable per (model, knobs, bucket)
_SINGLE_EXECUTABLES = ExecutableCache(maxsize=32)


def beam_search_batch(nnet, variables, batch: List,
                      lm: Optional[LmAdapter] = None, sos=-1, eos=-1,
                      beam_size: int = 8, nbest: int = 1, max_len: int = -1,
                      pad_to: int = -1,
                      matmul_precision: str = "default",
                      mesh=None,
                      **kwargs) -> List[List[Dict]]:
    """True batched beam search: ONE compiled program decodes the whole
    batch — encoder runs padded+masked, then ONE flat search loop runs
    over N*K fused (utterance x beam) lanes (see _search_core; finished
    beams freeze via done-semantics). Padded CTC frames are forced to
    certain-blank, which leaves prefix scores exactly invariant, so
    results match the per-utterance search. Callers should length-bucket
    utterances so only a few (batch, S) shapes ever compile."""
    param = _param_from_kwargs(sos, eos, beam_size=beam_size, **kwargs)
    # pad_to lets callers pin the padded length to a bucket size so the
    # compiled executable is reused across batches
    x_pad, lens, S = stack_padded(batch, pad_to=pad_to)
    x_len = jnp.asarray(lens)
    if mesh is not None and x_pad.shape[0] % mesh.shape["data"] == 0:
        # uneven tail batches fall back to single-device execution
        from jax.sharding import NamedSharding, PartitionSpec
        dp = NamedSharding(mesh, PartitionSpec("data"))
        x_pad = jax.device_put(x_pad, dp)
        x_len = jax.device_put(x_len, dp)
    with jax.default_matmul_precision(matmul_precision):
        enc_out, enc_len, ctc_out = jit_apply(
            nnet, variables, x_pad, x_len,
            method="decode_enc")
    T = enc_out.shape[1]
    ml = max_len if max_len > 0 else param.max_len
    ml = min(ml, T, param.max_len)
    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    if use_ctc:
        # padded frames emit blank with certainty: gamma recursions (and so
        # all prefix scores) are unchanged by the padding
        V = ctc_out.shape[-1]
        tmask = jnp.arange(T)[None, :] < enc_len[:, None]
        pad_logits = jnp.full((V,), -1e9).at[V - 1].set(0.0)
        ctc_out = jnp.where(tmask[..., None], ctc_out, pad_logits)
    else:
        ctc_out = None

    key = (id(nnet), id(lm), tuple(sorted(vars(param).items())), ml,
           use_ctc, enc_out.shape[1:], S, matmul_precision)

    def _build():
        def _run(variables, enc_out, enc_len, ctc_out):
            with jax.default_matmul_precision(matmul_precision):
                return _search_core(nnet, variables, enc_out, enc_len,
                                    ctc_out, lm, param, ml)

        return jax.jit(_run)

    step = _BATCH_EXECUTABLES.get(key, _build)
    final = jax.device_get(step(variables, enc_out, enc_len, ctc_out))
    K = param.beam_size
    return [
        extract_nbest(
            _gather_tree(final, slice(b * K, (b + 1) * K)), param, nbest,
            final=True) for b in range(len(batch))
    ]


def decoder_rescore(ctc_nbest: List[Dict], nnet, variables, enc_out,
                    ctc_weight: float = 0,
                    len_norm: bool = True) -> List[Dict]:
    """Rescore CTC nbest hypotheses with the attention decoder.
    enc_out: 1 x T x D."""
    nbest = len(ctc_nbest)
    eos = ctc_nbest[0]["trans"][-1]
    max_len = max(len(h["trans"]) - 1 for h in ctc_nbest)
    tgt = np.full((nbest, max_len), eos, dtype=np.int64)
    for i, h in enumerate(ctc_nbest):
        seq = h["trans"][:-1]
        tgt[i, :len(seq)] = seq
    enc_rep = jnp.repeat(enc_out, nbest, 0)
    # score nbest prefixes with the decoder, step by step
    K = nbest
    carry, cache = nnet.apply(variables, enc_rep, K, None,
                              method="decode_prep")
    logps = []
    for t in range(max_len):
        pred, carry = nnet.apply(variables, jnp.asarray(tgt[:, t]), enc_rep,
                                 carry, cache, None, method="decode_step")
        logps.append(jax.nn.log_softmax(pred, -1))
    dec_score = jnp.stack(logps, 1)  # K x To x V
    dec_score = np.asarray(dec_score)
    rescored = []
    for i, hyp in enumerate(ctc_nbest):
        att_score = 0.0
        for n, w in enumerate(hyp["trans"][1:]):
            att_score += float(dec_score[i, n, w])
        fusion = hyp["score"] * ctc_weight + att_score
        norm = len(hyp["trans"][1:]) if len_norm else 1
        rescored.append({"score": fusion / norm, "trans": hyp["trans"]})
    return sorted(rescored, key=lambda h: h["score"], reverse=True)
