#!/usr/bin/env python
"""Transducer decoding: greedy and beam search.

Parity surface: /root/reference/aps/asr/beam_search/transducer.py
(TransducerBeamSearch:56, Graves Algorithm 1). TPU redesign: a
frame-synchronous "modified" beam search — one compiled lax loop over
encoder frames, K hypotheses, at most one non-blank emission per frame
(the standard TPU/GPU-friendly variant; Graves' per-frame expansion loop
with prefix merging does not map to fixed shapes). Greedy = beam 1."""

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aps_tpu.asr.beam_search.lm import LmAdapter
from aps_tpu.const import MIN_F32


class TransducerState(NamedTuple):
    tokens: jnp.ndarray  # K x (T+1) emitted tokens (blank-padded)
    length: jnp.ndarray  # K
    score: jnp.ndarray   # K
    dec_out: jnp.ndarray  # K x J current prediction-net output
    hidden: tuple        # prediction net state


def beam_search(nnet,
                variables,
                x: jnp.ndarray,
                lm: Optional[LmAdapter] = None,
                lm_weight: float = 0,
                beam_size: int = 8,
                nbest: int = 8,
                len_norm: bool = True,
                **kwargs) -> List[Dict]:
    """Single-utterance transducer beam search. x: S or Ti x F."""
    blank = nnet.blank
    enc_out, enc_len = nnet.apply(variables, x[None], method="decode_enc")
    enc_out = enc_out[0]  # T x D
    T = enc_out.shape[0]
    K = beam_size

    # initial prediction-network state from the decoder config (setup-built
    # submodules are not reachable on the unbound model)
    if nnet.dec_type != "rnn":
        raise NotImplementedError(
            "compiled transducer beam search currently supports RNN "
            "prediction networks (xfmr decoder: growing prefix state)")
    dec_kwargs = dict(nnet.dec_kwargs or {})
    hid = dec_kwargs.get("hidden", 512)
    layers = dec_kwargs.get("num_layers", 3)
    rnn_type = dec_kwargs.get("rnn", "lstm")
    if rnn_type.lower() == "lstm":
        one = lambda: (jnp.zeros((K, hid)), jnp.zeros((K, hid)))
    else:
        one = lambda: jnp.zeros((K, hid))
    hidden0 = tuple(one() for _ in range(layers))
    blank_tok = jnp.full((K, 1), blank, dtype=jnp.int32)
    dec_out0, hidden0 = nnet.apply(variables, blank_tok, hidden0,
                                   method="decode_pred")
    score0 = jnp.where(jnp.arange(K) == 0, 0.0, MIN_F32)
    state0 = TransducerState(
        tokens=jnp.full((K, T + 1), blank, dtype=jnp.int32),
        length=jnp.zeros((K,), dtype=jnp.int32),
        score=score0,
        dec_out=dec_out0,
        hidden=hidden0)

    def frame_step(t, state):
        enc_frame = jnp.tile(enc_out[t][None], (K, 1))
        logits = nnet.apply(variables, enc_frame, state.dec_out,
                            method="decode_joint")
        logp = jax.nn.log_softmax(logits, -1)  # K x V
        V = logp.shape[-1]
        total = state.score[:, None] + logp
        flat_score, flat_idx = jax.lax.top_k(total.reshape(-1), K)
        beam_idx = flat_idx // V
        tok = flat_idx % V
        emits = tok != blank
        # gather beams
        tokens = state.tokens[beam_idx]
        length = state.length[beam_idx]
        tokens = jnp.where(
            (jnp.arange(T + 1)[None, :] == length[:, None]) &
            emits[:, None], tok[:, None], tokens)
        length = length + emits.astype(jnp.int32)
        hidden = jax.tree_util.tree_map(lambda h: h[beam_idx], state.hidden)
        dec_out = state.dec_out[beam_idx]
        # advance prediction net only for emitting beams
        new_dec_out, new_hidden = nnet.apply(
            variables, tok[:, None], hidden, method="decode_pred")
        dec_out = jnp.where(emits[:, None], new_dec_out, dec_out)
        hidden = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                emits.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            new_hidden, hidden)
        return TransducerState(tokens=tokens, length=length,
                               score=flat_score, dec_out=dec_out,
                               hidden=hidden)

    final = jax.lax.fori_loop(0, T, frame_step, state0)
    final = jax.device_get(final)
    hyps = []
    for k in range(K):
        if float(final.score[k]) <= MIN_F32 / 2:
            continue
        n = int(final.length[k])
        seq = [int(v) for v in np.asarray(final.tokens[k, :n])]
        norm = max(n, 1) if len_norm else 1
        hyps.append({"score": float(final.score[k]) / norm,
                     "trans": [blank] + seq})
    hyps = sorted(hyps, key=lambda h: h["score"], reverse=True)
    return hyps[:nbest]


def greedy_search(nnet, variables, x, **kwargs) -> List[Dict]:
    return beam_search(nnet, variables, x, beam_size=1, nbest=1, **kwargs)
