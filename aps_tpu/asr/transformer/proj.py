#!/usr/bin/env python
"""Input projection layers before transformer encoders.

Parity surface: /root/reference/aps/asr/transformer/proj.py (LinearProj:32,
Conv1dProj:60, Conv2dProj:105; registry "xfmr_proj_layer")."""

from typing import List, Optional, Tuple, Union

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.component import Normalize1d
from aps_tpu.asr.base.encoder import Conv1dEncoder, Conv2dEncoder
from aps_tpu.libs import Register

XfmrProjLayer = Register("xfmr_proj_layer")


def get_xfmr_proj(proj_name: str, in_features: int, att_dim: int,
                  **kwargs) -> nn.Module:
    if proj_name not in XfmrProjLayer:
        raise ValueError(f"Unsupported projection layer: {proj_name}")
    return XfmrProjLayer[proj_name](input_size=in_features,
                                    embed_dim=att_dim, **kwargs)


@XfmrProjLayer.register("linear")
class LinearProj(nn.Module):
    input_size: int
    embed_dim: int
    dropout: float = 0.0
    norm: str = "LN"

    def num_frames(self, inp_len):
        return inp_len

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        out = nn.Dense(self.embed_dim)(inp)
        out = Normalize1d(name_=self.norm)(out, training=training)
        out = nn.Dropout(self.dropout, deterministic=not training,
                         rng_collection="dropout")(out)
        return jax.nn.relu(out), inp_len


@XfmrProjLayer.register("conv1d")
class Conv1dProj(nn.Module):
    input_size: int
    embed_dim: int
    norm: str = "BN"
    dropout: float = 0.0
    dim: int = 256
    kernel: Union[List[int], int] = 3
    stride: Union[List[int], int] = 2
    num_layers: int = 2
    for_streaming: bool = False

    def _conv(self):
        return Conv1dEncoder(inp_features=self.input_size,
                             out_features=self.embed_dim,
                             dim=self.dim,
                             norm=self.norm,
                             num_layers=self.num_layers,
                             dropout=self.dropout,
                             kernel=self.kernel,
                             stride=self.stride,
                             for_streaming=self.for_streaming)

    def num_frames(self, inp_len):
        return self._conv().compute_outp_dim(inp_len)

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        if inp.ndim == 4:
            # N x C x T x F (front-end output) -> N x T x C*F
            N, _, T, _ = inp.shape
            inp = jnp.swapaxes(inp, 1, 2).reshape(N, T, -1)
        return self._conv()(inp, inp_len, training=training)


@XfmrProjLayer.register("conv2d")
class Conv2dProj(nn.Module):
    input_size: int
    embed_dim: int
    norm: str = "BN"
    kernel: Union[List, int] = 3
    stride: Union[List, int] = 2
    num_layers: int = 2
    in_channels: int = 1
    conv_channels: int = 256
    for_streaming: bool = False

    def _conv(self):
        return Conv2dEncoder(inp_features=self.input_size,
                             out_features=self.embed_dim,
                             channel=self.conv_channels,
                             in_channels=self.in_channels,
                             num_layers=self.num_layers,
                             norm=self.norm,
                             kernel=self.kernel,
                             stride=self.stride,
                             for_streaming=self.for_streaming)

    def num_frames(self, inp_len):
        return self._conv().compute_outp_dim(inp_len)

    @nn.compact
    def __call__(self, inp, inp_len, training: bool = False):
        if inp.ndim == 4:
            # reference N x C x T x F -> channel-last N x T x F x C
            inp = jnp.transpose(inp, (0, 2, 3, 1))
        return self._conv()(inp, inp_len, training=training)
