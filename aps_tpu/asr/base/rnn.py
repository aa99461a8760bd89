#!/usr/bin/env python
"""Stacked RNN building blocks (LSTM/GRU/vanilla, bi/uni-directional,
projection + layer-norm variants).

Parity surface: /root/reference/aps/asr/base/encoder.py (PyTorchRNNEncoder:143,
VariantRNNEncoder:226) and aps/asr/base/jit.py (LSTM w/ projection+LayerNorm).

TPU design: cells scan over time via flax.linen.RNN (lax.scan -> one fused
XLA while loop); gate matmuls are batched into single (4H, D) projections to
keep the MXU busy. State is explicit so streaming/decoding can carry it."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _cell(rnn_type: str, hidden: int):
    rnn_type = rnn_type.lower()
    if rnn_type == "lstm":
        return nn.OptimizedLSTMCell(hidden)
    if rnn_type == "gru":
        return nn.GRUCell(hidden)
    if rnn_type == "rnn":
        return nn.SimpleCell(hidden)
    raise ValueError(f"Unsupported rnn type: {rnn_type}")


class SingleRNN(nn.Module):
    """One (optionally bidirectional) recurrent layer over N x T x D."""
    hidden: int
    rnn_type: str = "lstm"
    bidirectional: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, inp_len=None,
                 training: bool = False):
        fwd = nn.RNN(_cell(self.rnn_type, self.hidden), name="fwd")
        out = fwd(inp, seq_lengths=inp_len)
        if self.bidirectional:
            bwd = nn.RNN(_cell(self.rnn_type, self.hidden), name="bwd",
                         reverse=True, keep_order=True)
            out = jnp.concatenate([out, bwd(inp, seq_lengths=inp_len)],
                                  axis=-1)
        return out


class StackedRNN(nn.Module):
    """Multi-layer RNN with optional input projection, per-layer hidden
    projection, layer-norm and dropout (the VariantRNN feature set)."""
    hidden: int
    num_layers: int = 3
    rnn_type: str = "lstm"
    bidirectional: bool = False
    dropout: float = 0.0
    input_proj: int = -1
    hidden_proj: int = -1
    layer_norm: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, inp_len=None,
                 training: bool = False):
        if self.input_proj > 0:
            inp = nn.Dense(self.input_proj, name="input_proj")(inp)
        out = inp
        for i in range(self.num_layers):
            out = SingleRNN(self.hidden, rnn_type=self.rnn_type,
                            bidirectional=self.bidirectional,
                            name=f"layer_{i}")(out, inp_len=inp_len,
                                               training=training)
            if self.hidden_proj > 0:
                out = jnp.tanh(
                    nn.Dense(self.hidden_proj, name=f"proj_{i}")(out))
            if self.layer_norm:
                out = nn.LayerNorm(name=f"ln_{i}")(out)
            if self.dropout > 0 and i != self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=not training,
                                 rng_collection="dropout")(out)
        return out


class LSTMCellWithState(nn.Module):
    """Single LSTM step for decoding loops: explicit (c, h) state."""
    hidden: int

    @nn.compact
    def __call__(self, carry, inp):
        cell = nn.OptimizedLSTMCell(self.hidden)
        return cell(carry, inp)

    def init_state(self, rng, batch: int, inp_dim: int):
        cell = nn.OptimizedLSTMCell(self.hidden)
        return cell.initialize_carry(rng, (batch, inp_dim))


class StackedLSTMWithState(nn.Module):
    """Multi-layer unidirectional LSTM exposing carried state — used by
    attention decoders, transducer prediction nets and streaming encoders.

    call: (x: N x T x D, state or None) -> (out: N x T x H, state)
    state: tuple of (c, h) per layer."""
    hidden: int
    num_layers: int = 2
    dropout: float = 0.0
    rnn_type: str = "lstm"
    layer_norm: bool = False
    proj_size: int = -1

    def init_state(self, batch: int):
        """Zero carried state (lstm: (c, h) per layer; gru/rnn: h)."""
        if self.rnn_type.lower() == "lstm":
            one = lambda: (jnp.zeros((batch, self.hidden)),
                           jnp.zeros((batch, self.hidden)))
        else:
            one = lambda: jnp.zeros((batch, self.hidden))
        return tuple(one() for _ in range(self.num_layers))

    @property
    def output_size(self) -> int:
        return self.proj_size if self.proj_size > 0 else self.hidden

    @nn.compact
    def __call__(self, inp: jnp.ndarray, state=None, training: bool = False):
        N = inp.shape[0]
        if state is None:
            state = self.init_state(N)
        new_state = []
        out = inp
        for i in range(self.num_layers):
            cell = _cell(self.rnn_type, self.hidden)
            layer = nn.RNN(cell, name=f"layer_{i}", return_carry=True)
            carry, out = layer(out, initial_carry=state[i])
            new_state.append(carry)
            if self.proj_size > 0:
                out = nn.Dense(self.proj_size, name=f"proj_{i}")(out)
            if self.dropout > 0 and i != self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=not training,
                                 rng_collection="dropout")(out)
            if self.layer_norm:
                out = nn.LayerNorm(name=f"ln_{i}")(out)
        return out, tuple(new_state)
