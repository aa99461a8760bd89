#!/usr/bin/env python
"""Vectorized beam search for transformer-decoder AMs.

Parity surface: /root/reference/aps/asr/beam_search/transformer.py
(greedy_search:21, beam_search:104, beam_search_batch:197).

One compiled lax.while_loop with fixed shapes. When the model exposes
decode_step_inc (TorchTransformerDecoder), each step processes only the
newest token against per-layer history buffers (O(L) per step); models
without it fall back to rescoring the padded K x (L+1) prefix under a
causal mask (O(L^2) per step)."""

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
    return BeamSearchParam(
        sos=sos, eos=eos,
        **{k: v for k, v in kwargs.items() if k in fields})


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


# max_len at/above which the search uses incremental decoding
# (decode_step_inc) instead of full-prefix rescoring. History: the
# round-2 vmapped search measured full rescore AHEAD at max_len 40
# (123x vs 94x RT) because its steps were bookkeeping-bound, so the
# crossover sat at 128. The round-4 flat-lane search is
# decoder-compute-bound instead, and the same A/B now puts incremental
# decoding 1.51x ahead at max_len 40 on the flagship bench config
# (1993.6x vs 1319.3x RT, identical transcripts on CPU where both
# programs round alike — BENCHMARKS.md round 4). Full rescore keeps the
# very-short regime where the prefix buffer is tiny.
INC_CROSSOVER = 32


def _search_core(nnet, variables, enc_out, enc_len, ctc_out, lm,
                 param, max_len: int):
    """Traced transformer-decoder search -> final BeamState over flat
    lanes. enc_out is T x D (single) or N x T x D (batch): the beam lives
    on ONE flat lane axis of N*K rows (lane u*K + k = beam k of utterance
    u) — see att._search_core for why this beats the per-utterance vmap."""
    from aps_tpu.asr.beam_search.att import segmented_topk, _per_utt
    K = param.beam_size
    if enc_out.ndim == 2:
        enc_out = enc_out[None]
        if ctc_out is not None:
            ctc_out = ctc_out[None]
        if enc_len is not None:
            enc_len = jnp.reshape(enc_len, (1,))
    N, T = enc_out.shape[0], enc_out.shape[1]
    lanes = N * K
    enc_tiled = jnp.repeat(enc_out, K, axis=0)
    enc_len_tiled = None if enc_len is None else jnp.repeat(enc_len, K)
    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    scorer = CtcScorer(ctc_out, eos=param.eos, beam_size=K,
                       use_pallas=param.ctc_fused,
                       interpret=jax.default_backend() != "tpu") \
        if use_ctc else None
    state0 = init_beam_state(K, max_len, param.sos, T, num_utts=N)
    lm_state0 = lm.init_state(lanes) if lm is not None else None
    ctc_state0 = scorer.init_state() if use_ctc else None
    # Incremental decoding (per-layer history cache, O(L) per step) vs
    # the full-prefix rescore (O(L^2) but pure dense matmuls): see
    # INC_CROSSOVER below for the measured regimes.
    use_inc = hasattr(nnet, "decode_step_inc") and max_len >= INC_CROSSOVER
    cache0 = nnet.apply(variables, lanes, max_len,
                        method="decode_init_cache") if use_inc else ()
    # cross-attention K/V of the (loop-invariant) encoder memory, computed
    # once — XLA does not hoist big matmuls out of while-loops itself.
    # Projected per UTTERANCE (batch N, not N*K) and consumed beam-shared:
    # ApsMultiheadAttention folds the K beams into the query-length axis,
    # so the memory is read once per utterance per step instead of once
    # per lane (8x less HBM traffic at beam 8)
    mem_kv = None
    if hasattr(nnet, "decode_prep_kv"):
        mem_kv = nnet.apply(variables, enc_out, method="decode_prep_kv")

    def dec_logits(tokens_buf, t, cache):
        """Logits for position t: lanes x V (+ updated cache)."""
        if use_inc:
            return nnet.apply(variables, enc_tiled, tokens_buf[:, t],
                              cache, t, enc_len=enc_len_tiled,
                              mem_kv=mem_kv, method="decode_step_inc")
        # out_idx=t: slice position t BEFORE the vocab projection, so the
        # (D x V) output matmul runs on one position, not the whole buffer
        dec_out = nnet.apply(variables, enc_tiled, tokens_buf,
                             enc_len=enc_len_tiled, out_idx=t,
                             mem_kv=mem_kv, method="decode_step")
        return dec_out, cache

    # espnet-style end detection: once a finished hypothesis exists
    # and no better one has finished for END_PATIENCE steps, stop early.
    # best_done/last_improve are tracked per utterance (N,)
    END_PATIENCE = 3

    def _go(t, state, best_done, last_improve):
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
        (t, state, lm_state, ctc_state, cache, best_done,
         last_improve) = loop
        tok_prev = state.tokens[:, t]
        pred, new_cache = dec_logits(state.tokens, t, cache)
        am_prob = jax.nn.log_softmax(
            pred.astype(jnp.float32) / param.temperature, -1)
        V = am_prob.shape[-1]
        lm_prob = 0.0
        if lm is not None:
            lm_prob, lm_state = lm.step(lm_state, tok_prev, t)
        if use_ctc:
            C = min(param.ctc_beam_size, V)
            # mask <unk> BEFORE pruning so --disable-unk also holds
            # under joint CTC/attention scoring
            att_score, cand = topk_candidates(
                disable_unk(am_prob, param.unk), C, param.approx_topk)
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
        new_state = BeamState(tokens=tokens, score=flat_score, done=done,
                              length=length,
                              coverage=state.coverage[beam_idx])
        if lm is not None:
            lm_state = lm.reorder(lm_state, beam_idx)
        if use_inc:
            # carry the history of the selected parent beams
            new_cache = new_cache[:, beam_idx]
        cur_best = _per_utt(jnp.where(done, flat_score, MIN_F32), N,
                            jnp.max)
        improved = cur_best > best_done
        if param.end_detect and N > 1:
            # freeze utterances whose per-utterance cond is already false
            # (a STALLED utterance still has live beams — exactly the
            # states vmap's while_loop batching would mask out)
            act = _go(t, state, best_done, last_improve)
            act_lane = jnp.repeat(act, K)
            sel0 = lambda n, o: jnp.where(
                act_lane.reshape((lanes,) + (1,) * (n.ndim - 1)), n, o)
            new_state = jax.tree_util.tree_map(sel0, new_state, state)
            if lm is not None:
                lm_state = jax.tree_util.tree_map(sel0, lm_state, loop[2])
            if use_ctc:
                sel1 = lambda n, o: jnp.where(act_lane[None, :], n, o)
                old_ctc = loop[3]
                ctc_state = type(ctc_state)(
                    sel1(ctc_state.gamma_n, old_ctc.gamma_n),
                    sel1(ctc_state.gamma_b, old_ctc.gamma_b),
                    sel0(ctc_state.score, old_ctc.score))
            if use_inc:
                # cache carries lanes on axis 1
                new_cache = jnp.where(
                    act_lane.reshape((1, lanes) +
                                     (1,) * (new_cache.ndim - 2)),
                    new_cache, cache)
            improved = improved & act
        best_done = jnp.where(improved, jnp.maximum(best_done, cur_best),
                              best_done)
        last_improve = jnp.where(improved, t, last_improve)
        return (t + 1, new_state, lm_state, ctc_state, new_cache,
                best_done, last_improve)

    loop0 = (0, state0, lm_state0, ctc_state0, cache0,
             jnp.full((N,), MIN_F32, jnp.float32),
             jnp.zeros((N,), jnp.int32))
    _, final_state, *_ = jax.lax.while_loop(cond, body, loop0)
    return final_state


def greedy_search(nnet, variables, x, sos=-1, eos=-1, **kwargs):
    kwargs.pop("beam_size", None)
    kwargs.pop("nbest", None)
    return beam_search(nnet, variables, x, sos=sos, eos=eos, beam_size=1,
                       nbest=1, **kwargs)


# jitted batched-search executables, keyed by (model, search knobs, shapes)
_BATCH_EXECUTABLES = ExecutableCache(maxsize=32)
# single-utterance searches, one executable per (model, knobs, bucket)
_SINGLE_EXECUTABLES = ExecutableCache(maxsize=32)


def beam_search_batch(nnet, variables, batch, lm=None, sos=-1, eos=-1,
                      beam_size: int = 8, nbest: int = 1, max_len: int = -1,
                      pad_to: int = -1,
                      matmul_precision: str = "default",
                      dtype: str = "float32",
                      mesh=None,
                      **kwargs):
    """Batched transformer-decoder beam search: one compiled program per
    (batch, length-bucket) shape; ONE flat search loop over N*K fused
    (utterance x beam) lanes (see att.beam_search_batch for the scheme).

    mesh: optional jax.sharding.Mesh with a "data" axis — the batch is
    sharded over it and GSPMD runs one independent search per shard on
    each device (multi-chip data-parallel decoding; batch size must
    divide the data axis)."""
    param = _param_from_kwargs(sos, eos, beam_size=beam_size, **kwargs)
    x_pad, lens, S = stack_padded(batch, pad_to=pad_to)
    x_len = jnp.asarray(lens)
    if mesh is not None and x_pad.shape[0] % mesh.shape["data"] == 0:
        # uneven tail batches fall back to single-device execution
        from jax.sharding import NamedSharding, PartitionSpec
        shard = NamedSharding(mesh, PartitionSpec("data"))
        x_pad = jax.device_put(x_pad, shard)
        x_len = jax.device_put(x_len, shard)
    with jax.default_matmul_precision(matmul_precision):
        enc_out, enc_len, ctc_out = jit_apply(
            nnet, variables, x_pad, x_len,
            method="decode_enc")
    T = enc_out.shape[1]
    ml = max_len if max_len > 0 else param.max_len
    ml = min(ml, T, param.max_len)
    use_ctc = param.ctc_weight > 0 and ctc_out is not None
    if use_ctc:
        V = ctc_out.shape[-1]
        tmask = jnp.arange(T)[None, :] < enc_len[:, None]
        pad_logits = jnp.full((V,), -1e9).at[V - 1].set(0.0)
        ctc_out = jnp.where(tmask[..., None], ctc_out, pad_logits)
    else:
        ctc_out = None

    key = (id(nnet), id(lm), tuple(sorted(vars(param).items())), ml,
           use_ctc, enc_out.shape[1:], S, matmul_precision, dtype)

    def _build():
        def _run(variables, enc_out, enc_len, ctc_out):
            if dtype == "bfloat16":
                # bf16 params + activations halve the HBM bytes of the
                # per-step decoder matmuls (the search loop is
                # bandwidth-bound at beam sizes); scores stay f32 — the
                # logits are upcast before log_softmax and the CTC
                # scorer keeps an f32 table, so beam ranking is unchanged
                cast = lambda x: x.astype(jnp.bfloat16) \
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 \
                    else x
                variables = jax.tree_util.tree_map(cast, variables)
                enc_out = enc_out.astype(jnp.bfloat16)

            with jax.default_matmul_precision(matmul_precision):
                return _search_core(nnet, variables, enc_out, enc_len,
                                    ctc_out, lm, param, ml)

        return jax.jit(_run)

    step = _BATCH_EXECUTABLES.get(key, _build)
    final = jax.device_get(step(variables, enc_out, enc_len, ctc_out))
    K = param.beam_size
    gather = lambda tree, b: jax.tree_util.tree_map(
        lambda x: x[b * K:(b + 1) * K], tree)
    return [
        extract_nbest(gather(final, b), param, nbest, final=True)
        for b in range(len(batch))
    ]
