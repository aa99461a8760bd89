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


def _search_core(nnet, variables, enc_out, enc_len, ctc_out, lm,
                 param: BeamSearchParam, max_len: int) -> BeamState:
    """The traced search program: enc_out T x D -> final dense BeamState.
    vmap-able over utterances (see beam_search_batch)."""
    K = param.beam_size
    T = enc_out.shape[0]
    enc_tiled = jnp.tile(enc_out[None], (K, 1, 1))
    enc_len_tiled = None if enc_len is None else jnp.full((K,), enc_len)

    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    scorer = CtcScorer(ctc_out, eos=param.eos, beam_size=K,
                       use_pallas=param.ctc_fused,
                       interpret=jax.default_backend() == "cpu") \
        if use_ctc else None

    carry0, att_cache = nnet.apply(variables, enc_tiled, K, enc_len_tiled,
                                   method="decode_prep")
    state0 = init_beam_state(K, max_len, param.sos, T)
    lm_state0 = lm.init_state(K) if lm is not None else None
    ctc_state0 = scorer.init_state() if use_ctc else None

    def dec_step(tok, carry):
        return nnet.apply(variables, tok, enc_tiled, carry, att_cache,
                          enc_len_tiled, method="decode_step")

    # espnet-style end detection: once a finished hypothesis exists
    # and no better one has finished for END_PATIENCE steps, stop early
    END_PATIENCE = 3

    def cond(loop):
        t, state, *_rest, best_done, last_improve = loop
        go = (t < max_len) & ~jnp.all(state.done)
        if param.end_detect:
            stalled = (best_done > MIN_F32 / 2) & \
                (t - last_improve >= END_PATIENCE)
            go = go & ~stalled
        return go

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
            flat_score, flat_idx = jax.lax.top_k(total.reshape(-1), K)
            beam_idx = flat_idx // C
            tok = cand[beam_idx, flat_idx % C]
            ctc_state = scorer.update_var(ctc_state_x, flat_idx)
        else:
            fusion = am_prob + param.lm_weight * lm_prob
            fusion = disable_unk(fusion, param.unk)
            fusion = apply_eos_threshold(fusion, param.eos,
                                         param.eos_threshold)
            fusion = mask_finished_scores(fusion, state.done, param.eos)
            total = state.score[:, None] + fusion
            flat_score, flat_idx = jax.lax.top_k(total.reshape(-1), K)
            beam_idx = flat_idx // V
            tok = flat_idx % V

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
        state = BeamState(tokens=tokens, score=flat_score, done=done,
                          length=length, coverage=coverage)
        carry = _gather_tree(carry, beam_idx)
        if lm is not None:
            lm_state = lm.reorder(lm_state, beam_idx)
        cur_best = jnp.max(jnp.where(done, flat_score, MIN_F32))
        improved = cur_best > best_done
        best_done = jnp.maximum(best_done, cur_best)
        last_improve = jnp.where(improved, t, last_improve)
        return (t + 1, state, carry, lm_state, ctc_state, best_done,
                last_improve)

    # lax.while_loop needs uniform pytrees; wrap None states as empty tuples
    loop0 = (0, state0, carry0, lm_state0, ctc_state0,
             jnp.float32(MIN_F32), 0)
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
    batch — encoder runs padded+masked, the per-utterance search loops are
    vmapped over the batch axis (JAX freezes finished lanes inside the
    batched while_loop). Padded CTC frames are forced to certain-blank,
    which leaves prefix scores exactly invariant, so results match the
    per-utterance search. Callers should length-bucket utterances so only
    a few (batch, S) shapes ever compile."""
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
            def core(enc, el, ctc):
                return _search_core(nnet, variables, enc, el, ctc, lm,
                                    param, ml)

            with jax.default_matmul_precision(matmul_precision):
                if ctc_out is None:
                    return jax.vmap(lambda e, el: core(e, el, None))(
                        enc_out, enc_len)
                return jax.vmap(core)(enc_out, enc_len, ctc_out)

        return jax.jit(_run)

    step = _BATCH_EXECUTABLES.get(key, _build)
    final = jax.device_get(step(variables, enc_out, enc_len, ctc_out))
    return [
        extract_nbest(_gather_tree(final, b), param, nbest, final=True)
        for b in range(len(batch))
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
