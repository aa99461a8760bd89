#!/usr/bin/env python
"""ASR encoders: RNN / variant-RNN / conv1d (TDNN) / conv2d / FSMN / concat.

Parity surface: /root/reference/aps/asr/base/encoder.py (encoder_instance:21,
ConcatEncoder:54, PyTorchRNNEncoder:143 -> "pytorch_rnn", JitLSTMEncoder:188
-> "jit_lstm", VariantRNNEncoder:226, Conv1dEncoder:312, Conv2dEncoder:368,
FSMNEncoder:445). All encoders: (inp N x T x F, inp_len N) ->
(out N x T' x D, out_len N)."""

from typing import Dict, List, Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.component import (FSMN, Conv1d, Conv2d, VariantRNN,
                                        rnn_output_nonlinear)
from aps_tpu.asr.base.rnn import StackedRNN
from aps_tpu.libs import Register

BaseEncoder = Register("base_encoder")


def encoder_instance(enc_type: str, inp_features: int, out_features: int,
                     enc_kwargs: Dict, enc_class: Dict) -> nn.Module:
    """Build an encoder (or a "concat" chain of encoders)."""

    def encoder(enc_type, inp_features, out_features, **kwargs):
        if enc_type not in enc_class:
            raise RuntimeError(f"Unknown encoder type: {enc_type}")
        return enc_class[enc_type](inp_features=inp_features,
                                   out_features=out_features, **kwargs)

    if enc_type != "concat":
        return encoder(enc_type, inp_features, out_features, **enc_kwargs)
    enc_layers = []
    num_enc_layers = len(enc_kwargs)
    if num_enc_layers <= 1:
        raise ValueError("Use >= 2 encoders for 'concat' type encoder")
    for i, (name, kwargs) in enumerate(enc_kwargs.items()):
        if i != num_enc_layers - 1:
            enc_layer = encoder(
                name,
                inp_features if i == 0 else enc_layers[-1].output_dim(), -1,
                **kwargs)
        else:
            enc_layer = encoder(name, enc_layers[-1].output_dim(),
                                out_features, **kwargs)
        enc_layers.append(enc_layer)
    return ConcatEncoder(enc_list=tuple(enc_layers))


class EncoderBase(nn.Module):
    """Adds inp_features/out_features bookkeeping (out_features == -1 means
    derived automatically; query with output_dim())."""
    inp_features: int = 0
    out_features: int = -1

    def output_dim(self) -> int:
        return self.out_features


class ConcatEncoder(nn.Module):
    """Chain of encoders, e.g. conv2d -> pytorch_rnn."""
    enc_list: Tuple[nn.Module, ...] = ()

    def output_dim(self) -> int:
        return self.enc_list[-1].output_dim()

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        for enc in self.enc_list:
            inp, inp_len = enc(inp, inp_len, training=training)
        return inp, inp_len


class RNNEncoderBase(EncoderBase):
    """(Linear) -> RNN -> (Linear) -> (NonLinear)."""
    input_proj: int = -1
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    hidden_proj: int = -1
    dropout: float = 0.2
    bidirectional: bool = False
    non_linear: str = "none"
    use_ln: bool = False

    def output_dim(self) -> int:
        if self.out_features > 0:
            return self.out_features
        hid = self.hidden_proj if self.hidden_proj > 0 else self.hidden
        return hid * (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        if self.non_linear not in rnn_output_nonlinear:
            raise ValueError(f"Unsupported non-linear: {self.non_linear}")
        if self.input_proj > 0:
            inp = jax.nn.relu(nn.Dense(self.input_proj, name="proj")(inp))
        out = StackedRNN(self.hidden,
                         num_layers=self.num_layers,
                         rnn_type=self.rnn,
                         bidirectional=self.bidirectional,
                         dropout=self.dropout,
                         hidden_proj=self.hidden_proj,
                         layer_norm=self.use_ln,
                         name="impl")(inp, inp_len=inp_len,
                                      training=training)
        if self.out_features > 0:
            out = nn.Dense(self.out_features, name="outp")(out)
            fn = rnn_output_nonlinear[self.non_linear]
            if fn is not None:
                out = fn(out)
        return out, inp_len


@BaseEncoder.register("pytorch_rnn")
class PyTorchRNNEncoder(RNNEncoderBase):
    """Name kept for config compatibility (it is a jax RNN now)."""
    pass


# alias used by configs written for the TPU build
BaseEncoder.register("rnn")(PyTorchRNNEncoder)


@BaseEncoder.register("jit_lstm")
class JitLSTMEncoder(RNNEncoderBase):
    """LSTM with projection/LayerNorm per layer (reference: jit-based)."""
    use_ln: bool = True


@BaseEncoder.register("variant_rnn")
class VariantRNNEncoder(EncoderBase):
    """Stack of VariantRNN layers with optional pyramid subsampling."""
    rnn: str = "lstm"
    hidden: int = 512
    num_layers: int = 3
    bidirectional: bool = True
    dropout: float = 0.0
    dropout_input: bool = True
    project: int = -1
    non_linear: str = "tanh"
    norm: str = ""
    pyramid_stack: bool = False
    add_forward_backward: bool = False

    def output_dim(self) -> int:
        if self.out_features > 0:
            return self.out_features
        factor = 2 if (self.bidirectional and
                       not self.add_forward_backward) else 1
        return self.hidden * factor

    def _inp_size(self, layer_idx: int) -> int:
        if layer_idx == 0:
            return self.inp_features
        if self.project > 0:
            return self.project
        in_size = self.hidden
        if self.bidirectional and not self.add_forward_backward:
            in_size *= 2
        if self.pyramid_stack:
            in_size *= 2
        return in_size

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        out_features = self.output_dim()
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            if i != 0 and self.pyramid_stack:
                T = inp.shape[1]
                if T % 2:
                    inp = inp[:, :-1]
                inp = jnp.concatenate([inp[:, ::2], inp[:, 1::2]], -1)
                inp_len = None if inp_len is None else inp_len // 2
            inp = VariantRNN(
                self._inp_size(i),
                rnn=self.rnn,
                norm=self.norm if not last else "",
                hidden=self.hidden,
                project=self.project if not last else out_features,
                dropout=self.dropout if not last else 0,
                bidirectional=self.bidirectional,
                non_linear=self.non_linear if not last else "none",
                add_forward_backward=self.add_forward_backward,
                name=f"layer_{i}")(inp, inp_len=inp_len, training=training)
        return inp, inp_len


@BaseEncoder.register("conv1d")
class Conv1dEncoder(EncoderBase):
    """Stack of TDNN (conv1d) layers with time reduction."""
    dim: int = 512
    norm: str = "BN"
    num_layers: int = 3
    kernel: Union[List[int], int] = 3
    stride: Union[List[int], int] = 2
    dilation: Union[List[int], int] = 1
    dropout: float = 0
    for_streaming: bool = False

    @staticmethod
    def _list(param, repeat):
        return [param] * repeat if isinstance(param, int) else list(param)

    def output_dim(self) -> int:
        return self.out_features if self.out_features > 0 else self.dim

    def _layer_cfgs(self):
        kernel = self._list(self.kernel, self.num_layers)
        stride = self._list(self.stride, self.num_layers)
        dilation = self._list(self.dilation, self.num_layers)
        return list(zip(kernel, stride, dilation))

    def compute_outp_dim(self, dim):
        for k, s, d in self._layer_cfgs():
            pad = 0 if self.for_streaming else (d * (k - 1)) // 2
            dim = (dim + 2 * pad - d * (k - 1) - 1) // s + 1
        return dim

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        for i, (k, s, d) in enumerate(self._layer_cfgs()):
            conv1d = Conv1d(self.inp_features if i == 0 else self.dim,
                            self.dim if i != self.num_layers - 1 else
                            self.output_dim(),
                            norm=self.norm,
                            kernel_size=k,
                            stride=s,
                            dilation=d,
                            dropout=self.dropout,
                            for_streaming=self.for_streaming,
                            name=f"conv_{i}")
            inp = conv1d(inp, training=training)
            if inp_len is not None:
                inp_len = conv1d.compute_outp_dim(inp_len)
        return inp, inp_len


@BaseEncoder.register("conv2d")
class Conv2dEncoder(EncoderBase):
    """Stack of conv2d layers with time/freq reduction, flattened to
    N x T' x (C*F')."""
    channel: Union[int, List[int]] = 32
    in_channels: int = 1
    norm: str = "BN"
    num_layers: int = 3
    kernel: Union[List, int] = 3
    stride: Union[List, int] = 2
    for_streaming: bool = False

    @staticmethod
    def _pairs(param, num_layers):
        if isinstance(param, int):
            return [(param, param)] * num_layers
        if isinstance(param[0], int):
            return [(p, p) for p in param]
        return [tuple(p) for p in param]

    def _channels(self):
        if isinstance(self.channel, int):
            return [self.channel] * self.num_layers
        return list(self.channel)

    def _layer_cfgs(self):
        kernel = self._pairs(self.kernel, self.num_layers)
        stride = self._pairs(self.stride, self.num_layers)
        return list(zip(kernel, stride))

    def _dim_after(self, dim, axis: int):
        for k, s in self._layer_cfgs():
            pad = (k[axis] - 1) // 2
            if self.for_streaming and axis == 0:
                pad = 0
            dim = (dim + 2 * pad - k[axis]) // s[axis] + 1
        return dim

    def _freq_x_channel(self) -> int:
        return int(self._dim_after(self.inp_features, 1)) * \
            self._channels()[-1]

    def output_dim(self) -> int:
        return self.out_features if self.out_features > 0 else \
            self._freq_x_channel()

    def compute_outp_dim(self, dim):
        return self._dim_after(dim, 0)

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        # N x T x F -> N x T x F x C
        if inp.ndim == 3:
            inp = inp[..., None]
        channels = self._channels()
        for i, (k, s) in enumerate(self._layer_cfgs()):
            conv2d = Conv2d(self.in_channels if i == 0 else channels[i - 1],
                            channels[i],
                            kernel_size=k,
                            norm=self.norm,
                            stride=s,
                            for_streaming=self.for_streaming,
                            name=f"conv_{i}")
            inp = conv2d(inp, training=training)
            if inp_len is not None:
                inp_len = conv2d.compute_outp_dim(inp_len, 0)
        N, T = inp.shape[:2]
        # N x T x F' x C -> N x T x (C*F') (channel-major like reference)
        out = jnp.swapaxes(inp, 2, 3).reshape(N, T, -1)
        if self.out_features > 0:
            out = nn.Dense(self.out_features, name="outp")(out)
        return out, inp_len


@BaseEncoder.register("fsmn")
class FSMNEncoder(EncoderBase):
    """Stack of FSMN layers with optional memory residual connections."""
    dim: int = 1024
    project: int = 512
    num_layers: int = 4
    residual: bool = True
    lctx: Union[List[int], int] = 3
    rctx: Union[List[int], int] = 3
    norm: str = "BN"
    dilation: Union[List[int], int] = 1
    dropout: float = 0.0
    for_streaming: bool = False

    def output_dim(self) -> int:
        return self.out_features

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        _list = lambda p: [p] * self.num_layers if isinstance(p, int) \
            else list(p)
        lctx, rctx, dilation = _list(self.lctx), _list(self.rctx), _list(
            self.dilation)
        memory = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            fsmn = FSMN(self.inp_features if i == 0 else self.dim,
                        self.dim if not last else self.out_features,
                        self.project,
                        lctx=lctx[i],
                        rctx=rctx[i],
                        norm=self.norm if not last else "none",
                        dilation=dilation[i],
                        dropout=self.dropout,
                        for_streaming=self.for_streaming,
                        name=f"fsmn_{i}")
            inp, new_memory = fsmn(inp, memory=memory, training=training)
            memory = new_memory if self.residual else None
        return inp, inp_len
