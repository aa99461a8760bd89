#!/usr/bin/env python
"""LM shallow-fusion adapters for beam search.

Parity surface: /root/reference/aps/asr/beam_search/lm.py (lm_score_impl:17,
adjust_hidden — hidden-state reindexing on beam reorder).

Each adapter provides init_state / step / reorder so LM state rides inside
the compiled beam loop. RNN LMs carry (c, h) tuples; transformer LMs keep a
fixed-size token ring buffer and re-score the prefix (padded) each step —
fixed shapes either way."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class LmAdapter(object):
    """Base adapter: subclasses wrap a concrete LM."""

    def init_state(self, beam: int):
        raise NotImplementedError

    def step(self, state, tok_prev, t):
        """-> (log-probs K x V, new state)."""
        raise NotImplementedError

    def reorder(self, state, beam_idx):
        return jax.tree_util.tree_map(lambda x: x[beam_idx], state)


class RnnLmAdapter(LmAdapter):
    """Adapter for asr@rnn_lm (carried hidden state)."""

    def __init__(self, lm, variables):
        self.lm = lm
        self.variables = variables

    def init_state(self, beam: int):
        # zero state built from the LM config (same layout as
        # StackedLSTMWithState.init_state)
        hid = self.lm.hidden_size
        if self.lm.rnn.lower() == "lstm":
            one = lambda: (jnp.zeros((beam, hid)), jnp.zeros((beam, hid)))
        else:
            one = lambda: jnp.zeros((beam, hid))
        return tuple(one() for _ in range(self.lm.num_layers))

    def step(self, state, tok_prev, t):
        out, state = self.lm.apply(self.variables, tok_prev[:, None],
                                   state, training=False)
        return jax.nn.log_softmax(out[:, -1], -1), state

    def reorder(self, state, beam_idx):
        return jax.tree_util.tree_map(lambda x: x[beam_idx], state)


class XfmrLmAdapter(LmAdapter):
    """Adapter for asr@xfmr_lm: fixed-size token buffer, full-prefix
    rescoring each step (O(L^2) but static shapes)."""

    def __init__(self, lm, variables, max_len: int, sos: int):
        self.lm = lm
        self.variables = variables
        self.max_len = max_len
        self.sos = sos

    def init_state(self, beam: int):
        return jnp.full((beam, self.max_len + 1), self.sos, dtype=jnp.int32)

    def step(self, state, tok_prev, t):
        buf = state.at[:, t].set(tok_prev)
        out, _ = self.lm.apply(self.variables, buf, None, training=False)
        # logits at position t predict token t+1
        logits = jnp.take_along_axis(
            out, jnp.full((buf.shape[0], 1, 1), t).astype(jnp.int32),
            axis=1)[:, 0]
        return jax.nn.log_softmax(logits, -1), buf

    def reorder(self, state, beam_idx):
        return state[beam_idx]


class NgramLmAdapter(LmAdapter):
    """Adapter for kenlm n-gram models (host-side; used only in rescoring
    paths, not inside compiled loops)."""

    def __init__(self, ngram_lm):
        self.lm = ngram_lm

    def init_state(self, beam: int):
        raise RuntimeError("NgramLmAdapter cannot run inside the compiled "
                           "beam loop; use lm_rescore instead")


def lm_adapter(lm, variables, max_len: int = 256,
               sos: int = 0) -> LmAdapter:
    """Build the right adapter from a registered LM module."""
    name = type(lm).__name__
    if "Xfmr" in name or "Transformer" in name:
        return XfmrLmAdapter(lm, variables, max_len, sos)
    return RnnLmAdapter(lm, variables)
