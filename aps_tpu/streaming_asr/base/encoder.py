#!/usr/bin/env python
"""Streaming encoders: RNN / FSMN / conv1d / conv2d with explicit state.

Parity surface: /root/reference/aps/streaming_asr/base/encoder.py
(StreamingRNNEncoder:19, StreamingFSMNEncoder:84, StreamingConv1dEncoder:160,
StreamingConv2dEncoder:202; StreamingBaseEncoder registry).

TPU design: the torch versions mutate module buffers (self.hx/hc/hm); here
every encoder exposes
  __call__(inp, inp_len)            offline/training path
  init_step_state(batch)            -> state pytree
  step(chunk, state)                -> (out, state)   [jit-able]
"""

from typing import Dict, List, Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.encoder import (Conv1dEncoder, Conv2dEncoder,
                                      FSMNEncoder, RNNEncoderBase)
from aps_tpu.asr.base.rnn import StackedLSTMWithState
from aps_tpu.asr.base.component import rnn_output_nonlinear
from aps_tpu.libs import Register

StreamingBaseEncoder = Register("streaming_encoder")


@StreamingBaseEncoder.register("pytorch_rnn")
class StreamingRNNEncoder(nn.Module):
    """Unidirectional RNN encoder with carried hidden state."""
    inp_features: int
    out_features: int
    input_proj: int = -1
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    hidden_proj: int = -1
    dropout: float = 0.0
    non_linear: str = "none"

    def setup(self):
        if self.input_proj > 0:
            self.proj = nn.Dense(self.input_proj)
        else:
            self.proj = None
        self.impl = StackedLSTMWithState(self.hidden,
                                         num_layers=self.num_layers,
                                         dropout=self.dropout,
                                         rnn_type=self.rnn,
                                         proj_size=self.hidden_proj)
        if self.out_features > 0:
            self.outp = nn.Dense(self.out_features)
        else:
            self.outp = None

    def output_dim(self) -> int:
        if self.out_features > 0:
            return self.out_features
        return self.hidden_proj if self.hidden_proj > 0 else self.hidden

    def init_step_state(self, batch: int):
        return self.impl.init_state(batch)

    def step(self, chunk: jnp.ndarray, state=None,
             training: bool = False):
        """chunk: N x (T) x D -> (out N x T x D', state)."""
        if chunk.ndim == 2:
            chunk = chunk[:, None]
        if self.proj is not None:
            chunk = jax.nn.relu(self.proj(chunk))
        out, state = self.impl(chunk, state=state, training=training)
        if self.outp is not None:
            out = self.outp(out)
        fn = rnn_output_nonlinear[self.non_linear]
        if fn is not None:
            out = fn(out)
        return out, state

    def __call__(self, inp: jnp.ndarray, inp_len, training: bool = False):
        out, _ = self.step(inp, state=None, training=training)
        return out, inp_len


@StreamingBaseEncoder.register("fsmn")
class StreamingFSMNEncoder(nn.Module):
    """FSMN encoder (valid/streaming context convs).

    Offline path feeds the whole padded utterance through the stack with
    for_streaming=True (caller pads lctx/rctx frames). `step` keeps a rolling
    per-layer input buffer of (lctx+rctx+1) frames."""
    inp_features: int
    out_features: int
    dim: int = 1024
    project: int = 512
    num_layers: int = 4
    lctx: Union[List[int], int] = 3
    rctx: Union[List[int], int] = 3
    residual: bool = False
    norm: str = "BN"
    dropout: float = 0.0

    def setup(self):
        self.impl = FSMNEncoder(inp_features=self.inp_features,
                                out_features=self.out_features,
                                dim=self.dim,
                                project=self.project,
                                num_layers=self.num_layers,
                                residual=self.residual,
                                lctx=self.lctx,
                                rctx=self.rctx,
                                norm=self.norm,
                                dilation=1,
                                dropout=self.dropout,
                                for_streaming=True)

    def output_dim(self) -> int:
        return self.out_features

    def __call__(self, inp: jnp.ndarray, inp_len, training: bool = False):
        return self.impl(inp, inp_len, training=training)

    def step(self, chunk: jnp.ndarray, state=None, training: bool = False):
        """Streaming step over a chunk that already includes the needed
        left/right context frames (the C++/python pipeline maintains the
        context queue, as in the reference's csrc/base/pipeline.h)."""
        out, _ = self.impl(chunk, None, training=training)
        return out, state


@StreamingBaseEncoder.register("conv1d")
class StreamingConv1dEncoder(Conv1dEncoder):
    """Conv1d (TDNN) encoder with valid (streaming) padding."""
    for_streaming: bool = True

    def step(self, chunk: jnp.ndarray, state=None, training: bool = False):
        out, _ = self.__call__(chunk, None, training=training)
        return out, state


@StreamingBaseEncoder.register("conv2d")
class StreamingConv2dEncoder(Conv2dEncoder):
    """Conv2d encoder with valid (streaming) time padding."""
    for_streaming: bool = True

    def step(self, chunk: jnp.ndarray, state=None, training: bool = False):
        out, _ = self.__call__(chunk, None, training=training)
        return out, state
