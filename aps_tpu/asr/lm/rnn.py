#!/usr/bin/env python
"""RNN language model (parity: /root/reference/aps/asr/lm/rnn.py,
registered "asr@rnn_lm"). call(token N x T, hidden) ->
(logits N x T x V, hidden)."""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.component import OneHotEmbedding
from aps_tpu.asr.base.rnn import StackedLSTMWithState
from aps_tpu.libs import ApsRegisters


@ApsRegisters.asr.register("asr@rnn_lm")
class TorchRNNLM(nn.Module):
    """Simple RNN LM (name kept for config parity)."""
    embed_size: int = 256
    vocab_size: int = 40
    rnn: str = "lstm"
    dropout: float = 0.2
    add_ln: bool = False
    proj_size: int = -1
    num_layers: int = 3
    hidden_size: int = 512
    tie_weights: bool = False

    def setup(self):
        if self.embed_size != self.vocab_size:
            self.embed = nn.Embed(self.vocab_size, self.embed_size)
        else:
            self.embed = OneHotEmbedding(self.vocab_size)
        self.pred = StackedLSTMWithState(self.hidden_size,
                                         num_layers=self.num_layers,
                                         dropout=self.dropout,
                                         rnn_type=self.rnn,
                                         layer_norm=self.add_ln,
                                         proj_size=self.proj_size)
        self.dist = nn.Dense(self.vocab_size)
        self.embed_drop = nn.Dropout(self.dropout, rng_collection="dropout")
        self.pred_drop = nn.Dropout(self.dropout, rng_collection="dropout")

    def init_state(self, batch: int):
        return self.pred.init_state(batch)

    def __call__(self, token: jnp.ndarray, hidden=None, token_len=None,
                 training: bool = False):
        emb = self.embed_drop(self.embed(token), deterministic=not training)
        out, hidden = self.pred(emb, state=hidden, training=training)
        out = self.dist(self.pred_drop(out, deterministic=not training))
        return out, hidden
